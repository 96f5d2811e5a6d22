"""Mergeable sketch relations: count-min and HyperLogLog.

At 100 TB the exact answers to "how often does each term occur" and
"how many distinct keys are there" are themselves big-data problems;
the classical fix is a SKETCH — a fixed-size summary whose cells are
order-free sums/maxes, so Spark computes it as ONE map-side-combined
aggregation and merges partial sketches for free (the combiner IS the
sketch merge).  Both sketches here are materialized as plain
DataFrames (relations), so they persist to parquet, union across
corpus shards, and join like any other table — no opaque binary blobs.

* :func:`count_min_sketch` — Cormode & Muthukrishnan's CM sketch
  (J. Algorithms 2005): ``depth`` rows of ``width`` counters,
  cell(d, w) = Σ count over keys with h_d(key) ≡ w.  Point estimate =
  min over rows (:func:`cms_estimate`) — always an OVERestimate,
  error ≤ ε·N with ε = e/width at confidence 1 − (1/e)^depth.
* :func:`hll_registers` / :func:`hll_estimate` — Flajolet et al.'s
  HyperLogLog (AofA 2007): 2^p registers, register = max leading-zero
  rank of the hashed key suffix; distinct estimate = bias-corrected
  harmonic mean with the small-range linear-counting correction.

Hashing is the engine's md5 convention (48-bit hex fold — the
dedup/_duck_md5hash48 parity class), so every cell is exactly
reproducible in the DuckDB oracle.  Determinism: all sketch cells are
integers; HLL's Σ 2^{−M_j} is computed as the EXACT integer
Σ 2^{49−p−M_j} — one bit of headroom above the hash width so the
SATURATED register (rank = 48−p+1, every remaining hash bit zero)
still contributes the integral term 2^0 = 1 rather than the 0.5 a
48−p scaling would truncate engine-dependently — with a single double
division + optional single ln at the very end — the lm_score/zipf
parity class.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: md5 nibbles per hash: 48 bits — inside BIGINT, matches
#: _duck_md5hash48 / the dedup Bloom schedule
_NIB = 12


def _h48(col, seed) -> "F.Column":
    """48-bit md5 hash of ``seed ':' value`` (seed varies the hash
    family member; the ':' keeps (1, 'x') and (11, '') distinct)."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, _NIB), 16, 10) \
        .cast("bigint")


def count_min_sketch(df: DataFrame, key_col: str,
                     count_col: str | None = None,
                     depth: int = 4, width: int = 1024,
                     group_cols: tuple = ()) -> DataFrame:
    """Build a CM sketch relation ``(*group_cols, d, w, count)`` over
    ``key_col`` (weighted by ``count_col`` if given, else each row
    counts 1) — one INDEPENDENT sketch per group when ``group_cols``
    is set (per-language heavy hitters, per-source term spikes: the
    dimension just joins the aggregation key).

    Only non-empty cells are emitted (absent cell ≡ 0), so the
    relation is ≤ groups·depth·width rows REGARDLESS of corpus size —
    the entire reduction is one explode-free map-side-combinable
    ``groupBy``: shuffle traffic is bounded by cells·partitions, not
    by the data.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got "
                         f"depth={depth}, width={width}")
    g = list(group_cols)
    cnt = (F.col(count_col).cast("bigint") if count_col
           else F.lit(1).cast("bigint"))
    rows = [df.select(
        *g,
        F.lit(d).alias("d"),
        (_h48(F.col(key_col), d) % width).cast("int").alias("w"),
        cnt.alias("__c")) for d in range(depth)]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return (allrows.groupBy(*g, "d", "w")
            .agg(F.sum("__c").cast("bigint").alias("count")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024,
                 group_cols: tuple = ()) -> DataFrame:
    """Point-estimate each key in ``keys`` against a sketch built with
    the same (depth, width): ``(key_col, est)``, est = min over the
    depth cells (0 for a never-seen key hitting only empty cells).

    The join is keys×depth rows against a ≤ depth·width-row relation —
    broadcast the SKETCH, not the keys: the query side may be a corpus
    slice, the sketch never outgrows a few MB by construction.

    A sketch built with ``group_cols`` holds one INDEPENDENT sketch
    per group; estimating it requires the same ``group_cols`` here (the
    group keys join alongside ``(d, w)`` and ``keys`` must carry them).
    The schema is asserted so a grouped sketch can never silently mix
    its groups' cells into one bogus estimate.
    """
    g = list(group_cols)
    expect = set(g) | {"d", "w", "count"}
    got = set(sketch.columns)
    if got != expect:
        raise ValueError(
            f"sketch schema {sorted(got)} != expected {sorted(expect)}"
            f" for group_cols={g!r} — a sketch built with group_cols"
            " must be estimated with the same group_cols")
    probes = None
    for d in range(depth):
        p = keys.select(
            *g, F.col(key_col),
            F.lit(d).alias("d"),
            (_h48(F.col(key_col), d) % width).cast("int").alias("w"))
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(F.broadcast(sketch), [*g, "d", "w"], "left")
    return (joined.groupBy(*g, key_col)
            .agg(F.min(F.coalesce(F.col("count"), F.lit(0)))
                 .cast("bigint").alias("est")))


def hll_registers(df: DataFrame, key_col: str, p: int = 9,
                  group_cols: tuple = ()) -> DataFrame:
    """HyperLogLog register relation ``(*group_cols, bucket, rho)``
    over the distinct values of ``key_col`` — one independent sketch
    per group when ``group_cols`` is set (the 100 TB warehouse
    pattern: approximate COUNT(DISTINCT key) per dimension in one
    combinable aggregation).  bucket = the hash's top ``p`` bits,
    rho = 1 + leading-zero count of the remaining ``48 − p`` bits
    (= 48 − p + 1 when they are all zero).

    ≤ groups·2^p rows regardless of input size; one map-side-combined
    ``groupBy(...).max`` — the max IS the HLL merge, so partial
    aggregation, shard union + re-max, and incremental maintenance
    (new data ⇒ union + re-max) all come for free.  Absent buckets are
    register value 0.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    g = list(group_cols)
    rem_bits = 48 - p
    h = _h48(F.col(key_col), 0)
    bucket = F.shiftright(h, rem_bits).cast("int")
    rem = h % F.lit(1 << rem_bits).cast("bigint")
    # leading zeros of rem within rem_bits = rem_bits − bit_length(rem);
    # bit_length via the base-2 string length of the non-zero value
    # (conv emits no leading zeros) — integer/string ops, no log2 float
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.conv(rem, 10, 2)))
    return (df.select(*g, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*g, "bucket")
            .agg(F.max("rho").cast("int").alias("rho")))


def hll_estimate(registers: DataFrame, p: int = 9,
                 group_cols: tuple = ()) -> DataFrame:
    """Bias-corrected HLL cardinality from a register relation: one
    row ``(m, n_zero, raw_sum_scaled, est)``.

    ``raw_sum_scaled`` = Σ_j 2^{49−p−M_j} over ALL m buckets (absent
    register ⇒ M_j = 0 ⇒ term 2^{49−p}) — an exact integer: the scale
    carries one bit of headroom over the 48-bit hash so the saturated
    register (M_j = 48−p+1) contributes exactly 2^0 = 1, never a
    fractional term whose BIGINT cast truncates in Spark but rounds in
    other engines.  The whole estimate is therefore deterministic: one
    double division for the raw estimate, and the Flajolet small-range
    linear-counting switch (est = m·ln(m/V) when raw < 2.5m and V > 0)
    costs a single ln.  Output ``est`` is floored to BIGINT.
    """
    m = 1 << p
    rem_bits = 48 - p
    alpha = (0.673 if p == 4 else 0.697 if p == 5
             else 0.709 if p == 6 else 0.7213 / (1 + 1.079 / m))
    g = list(group_cols)
    # 2^{rem_bits + 1 − rho} via double pow is exact (exponent in
    # [0, 45] < 53 mantissa bits), cast back to the integer it is
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), (F.lit(rem_bits + 1) - F.col("rho"))
                    .cast("double")).cast("bigint"))
        .cast("bigint").alias("present_sum")]
    agg = (registers.groupBy(*g).agg(*aggs) if g
           else registers.agg(*aggs))
    n_zero = (F.lit(m) - F.col("n_present")).cast("bigint")
    raw_sum = (F.col("present_sum")
               + n_zero * F.lit(1 << (rem_bits + 1)).cast("bigint"))
    raw_est = (F.lit(alpha * m * m * float(1 << (rem_bits + 1)))
               / raw_sum.cast("double"))
    est = F.when(
        (raw_est < 2.5 * m) & (n_zero > 0),
        F.floor(F.lit(float(m)) * F.log(F.lit(float(m))
                                        / n_zero.cast("double"))))\
        .otherwise(F.floor(raw_est)).cast("bigint")
    return agg.select(
        *g,
        F.lit(m).cast("int").alias("m"),
        n_zero.alias("n_zero"),
        raw_sum.alias("raw_sum_scaled"),
        est.alias("est"))


def hll_merge(*register_dfs: DataFrame,
              group_cols: tuple = ()) -> DataFrame:
    """Union register relations from independent shards into one
    equivalent sketch (max per bucket, per group when ``group_cols``
    is set) — the property that makes HLL a distributed-aggregation
    primitive rather than a trick.

    The schema is asserted against ``group_cols``: register relations
    built with ``group_cols`` hold one sketch per group, and a bare
    ``groupBy("bucket")`` merge would silently max-merge all groups
    into one combined sketch (ADVICE r8)."""
    if not register_dfs:
        raise ValueError("need at least one register relation")
    g = list(group_cols)
    expect = set(g) | {"bucket", "rho"}
    for r in register_dfs:
        got = set(r.columns)
        if got != expect:
            raise ValueError(
                f"register schema {sorted(got)} != expected "
                f"{sorted(expect)} for group_cols={g!r} — a grouped "
                "register relation must be merged with the same "
                "group_cols")
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy(*g, "bucket").agg(F.max("rho").cast("int")
                                         .alias("rho"))


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256,
               group_cols: tuple = ()) -> DataFrame:
    """K-minimum-values distinct sketch (Beyer et al., SIGMOD 2007):
    ``(*group_cols, rank, h)`` — the ``k`` smallest DISTINCT 48-bit
    hashes of ``key_col`` per group, rank 1 = smallest.  Groups with
    fewer than ``k`` distinct hashes keep them all (the sketch is then
    exact).  This is the set-resemblance leg of the sketch family:
    counts → CM, distincts → HLL, quantiles → histogram, and
    OVERLAP/Jaccard between sets → this (:func:`kmv_overlap`), because
    min-hash samples of two sets are comparable where HLL registers
    are not.

    Two-level build, no raw-data shuffle: level 1 groups by
    ``(*group_cols, spark_partition_id())`` — every cell is
    partition-local, so the map-side partial aggregation completes the
    per-partition distinct set and only per-partition distinct hashes
    (exactly a ``distinct()``'s combined payload) travel; level 2
    re-mins the ≤ partitions·k survivors per group.  min-of-mins =
    union merge, so shard sketches union + re-min like HLL registers.
    Hash collisions: the sketch estimates distinct HASHES (48-bit
    space; the engine-wide md5 convention), indistinguishable from
    distinct keys until ~2^24 distinct per group.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = list(group_cols)
    hashed = df.select(*g, _h48(F.col(key_col), 0).alias("h"))
    partial = (hashed
               .groupBy(*g, F.spark_partition_id().alias("__p"))
               .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k)
                    .alias("__hs")))
    merged = (partial.select(*g, F.explode("__hs").alias("h"))
              .groupBy(*g)
              .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k)
                   .alias("__hs")))
    return (merged.select(*g, F.posexplode("__hs").alias("__i", "h"))
            .select(*g, (F.col("__i") + 1).cast("int").alias("rank"),
                    F.col("h").cast("bigint").alias("h")))


def kmv_estimate(sketch: DataFrame, k: int,
                 group_cols: tuple = ()) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_sketch` built with the
    same ``k``: ``(*group_cols, n_sample, kth_h, est)``.  A full sketch
    estimates (k−1)·2^48 ``div`` h_(k) (the unbiased KMV estimator —
    k−1, not k, corrects the kth order statistic's bias); a short
    sketch (< k hashes) IS the distinct set, so est = n_sample exactly.
    All integer arithmetic — engine-exact replay in any SQL oracle.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = list(group_cols)
    agg = (sketch.groupBy(*g)
           .agg(F.count(F.lit(1)).cast("int").alias("n_sample"),
                F.max("h").cast("bigint").alias("kth_h")))
    num = (k - 1) * (1 << 48)
    est = F.when(F.col("n_sample") < k,
                 F.col("n_sample").cast("bigint")) \
        .otherwise(F.expr(f"CAST({num} AS BIGINT) div kth_h")) \
        .cast("bigint")
    return agg.select(*g, "n_sample", "kth_h", est.alias("est"))


def kmv_merge(*sketches: DataFrame, k: int,
              group_cols: tuple = ()) -> DataFrame:
    """Union-merge KMV sketches: keep the ``k`` smallest DISTINCT
    hashes of the union per group — min-of-mins, so shard sketches
    built independently union into exactly the sketch of the combined
    corpus's hash set (the HLL-merge property, on the set-resemblance
    leg).  Schema asserted against ``group_cols`` like
    :func:`hll_merge`."""
    if not sketches:
        raise ValueError("need at least one sketch relation")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = list(group_cols)
    expect = set(g) | {"rank", "h"}
    for s in sketches:
        got = set(s.columns)
        if got != expect:
            raise ValueError(
                f"sketch schema {sorted(got)} != expected "
                f"{sorted(expect)} for group_cols={g!r}")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    merged = (out.groupBy(*g)
              .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k)
                   .alias("__hs")))
    return (merged.select(*g, F.posexplode("__hs").alias("__i", "h"))
            .select(*g, (F.col("__i") + 1).cast("int").alias("rank"),
                    F.col("h").cast("bigint").alias("h")))


def kmv_novelty(base: DataFrame, incoming: DataFrame,
                k: int) -> DataFrame:
    """How many NEW distinct keys does ``incoming`` add over ``base``?
    One row ``(base_est, union_est, novelty_est)`` with
    ``novelty_est = max(union_est − base_est, 0)`` — the inclusion–
    exclusion estimate |B \\ A| = |A ∪ B| − |A| from two KMV sketches
    (both built with the same ``k``; the union sketch via
    :func:`kmv_merge`).

    This is the sketch-tier twin of the exact ``corpus_diff``: at
    100 TB "does this crawl snapshot add anything?" must be answerable
    from two ≤ k-row relations, not a full anti-join.  All-integer
    estimates; the subtraction inherits both estimators' ~1/√k
    relative error, so novelty ≪ base may read 0 — the documented
    resolution floor, not a bug."""
    ua = kmv_estimate(base, k)
    uu = kmv_estimate(kmv_merge(base, incoming, k=k), k)
    a = ua.select(F.col("est").alias("base_est"))
    u = uu.select(F.col("est").alias("union_est"))
    return (a.crossJoin(u)        # two 1-row scalars — the bm25 idiom
            .select("base_est", "union_est",
                    F.greatest(F.col("union_est") - F.col("base_est"),
                               F.lit(0).cast("bigint"))
                    .alias("novelty_est")))


def kmv_overlap(sketch: DataFrame, k: int, group_col: str) -> DataFrame:
    """Pairwise set resemblance between every two groups of a
    :func:`kmv_sketch`: ``(ga, gb, n_sample, n_common, jaccard_e6)``
    for each unordered group pair (ga < gb).

    Estimator (Beyer et al. 2007 / min-hash resemblance): merge the
    two groups' hash sets, keep the ``k`` smallest of the UNION (a
    valid KMV sample of A ∪ B because both inputs kept their k
    smallest); Jaccard ≈ |sample ∩ A ∩ B| / |sample|, emitted as the
    exact integer ``1000000·n_common div n_sample``.

    Everything runs on the sketch relation (≤ groups·k rows).  The
    group-pair generator is an inequality join of the two G-row group
    lists — the ONE deliberate contract-bounded nested loop (G =
    corpus dimension cardinality: languages, sources, shards), exactly
    the ``nb_lang`` label-cross class, NOT a data-sized cartesian; the
    pairs then EXPLODE to (ga, gb, side-group) rows so sketch
    membership is a plain hash equi-join on the group key.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    s = sketch.select(F.col(group_col).alias("g"),
                      F.col("h").alias("h"))
    groups = s.select("g").distinct()
    pairs = (groups.select(F.col("g").alias("ga"))
             .join(groups.select(F.col("g").alias("gb")),
                   F.col("ga") < F.col("gb")))
    sides = pairs.select(
        "ga", "gb", F.explode(F.array("ga", "gb")).alias("g"))
    u = (sides.join(s, "g")
         .groupBy("ga", "gb", "h")
         .agg(F.max(F.when(F.col("g") == F.col("ga"), 1)
                    .otherwise(0)).alias("in_a"),
              F.max(F.when(F.col("g") == F.col("gb"), 1)
                    .otherwise(0)).alias("in_b")))
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = (u.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k))
    agg = (topk.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).cast("int").alias("n_sample"),
                F.sum((F.col("in_a") * F.col("in_b")).cast("bigint"))
                .cast("int").alias("n_common")))
    return agg.withColumn(
        "jaccard_e6",
        F.expr("CAST(1000000 * CAST(n_common AS BIGINT) "
               "div n_sample AS BIGINT)"))


def exact_error_bound(depth: int, width: int, n_total: int) -> float:
    """CM sketch additive-error bound ε·N = (e/width)·N at confidence
    1 − (1/e)^depth — the number to quote next to an estimate."""
    return math.e / width * n_total


def histogram_sketch(df: DataFrame, value_col: str,
                     lo: float, hi: float, bins: int = 128,
                     group_cols: tuple = ()) -> DataFrame:
    """Fixed-range histogram sketch ``(*group_cols, bin, count)`` —
    the mergeable-quantiles leg of the sketch family (counts: CM,
    distincts: HLL, quantiles: this).  Values clamp into
    ``[lo, hi)``'s ``bins`` equal-width buckets (bin 0 and bins−1
    absorb underflow/overflow), NULLs are dropped; cells are plain
    integer counts, so the sketch merges by cell-sum like the CM
    sketch and the whole build is one map-side-combined aggregation
    bounded at groups·bins rows.

    The fixed [lo, hi) contract is the deliberate trade vs adaptive
    sketches (t-digest/KLL): those re-center buckets per partition and
    merge approximately, which breaks engine-exact replay; a fixed
    grid costs one prior pass (or domain knowledge) for the range and
    in exchange every cell — and every quantile derived from it — is
    bit-reproducible anywhere.
    """
    if bins < 1 or not hi > lo:
        raise ValueError(
            f"need bins >= 1 and hi > lo; got bins={bins}, "
            f"lo={lo}, hi={hi}")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo)))
                  * F.lit(bins / (hi - lo))).cast("int")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (df.where(v.isNotNull())
            .select(*g, b.alias("bin"))
            .groupBy(*g, "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("count")))


def histogram_quantiles(hist: DataFrame, qs: tuple,
                        lo: float, hi: float, bins: int = 128,
                        group_cols: tuple = ()) -> DataFrame:
    """Quantile estimates from a :func:`histogram_sketch`:
    ``(*group_cols, q_e6, value_e6)`` per requested quantile —
    value = left edge of the first bin whose cumulative count reaches
    ``ceil(q·N)`` (the lower-edge convention: deterministic, no
    interpolation ambiguity; resolution = (hi−lo)/bins by contract).

    One window cumsum over ≤ groups·bins rows + a per-(group, q)
    min-aggregate — everything after the sketch is arithmetic on the
    bounded relation.
    """
    from pyspark.sql import Window

    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy("bin") if g \
        else Window.orderBy("bin")
    cum = (hist.withColumn("__cum", F.sum("count").over(w))
           .withColumn("__n", F.sum("count").over(
               Window.partitionBy(*g) if g
               else Window.partitionBy())))
    width = (hi - lo) / bins
    out = None
    for q in qs:
        need = F.ceil(F.col("__n") * F.lit(float(q))).cast("bigint")
        hit = (cum.where(F.col("__cum") >= need)
               .groupBy(*g)
               .agg(F.min("bin").alias("__bin")))
        row = hit.select(
            *g,
            F.lit(int(round(q * 1e6))).cast("bigint").alias("q_e6"),
            F.floor((F.lit(float(lo)) + F.col("__bin")
                     * F.lit(float(width))) * F.lit(1000000.0)
                    + F.lit(0.5)).cast("bigint").alias("value_e6"))
        out = row if out is None else out.unionByName(row)
    return out


def kmv_pair_report(sketch: DataFrame, k: int,
                    group_col: str) -> DataFrame:
    """:func:`kmv_overlap` widened with the inclusion–exclusion leg —
    per unordered group pair (ga < gb): ``(ga, gb, n_sample, n_common,
    jaccard_e6, est_a, est_b, union_est, novelty_ab, novelty_ba)``.

    One relation answers BOTH sketch-tier questions a corpus audit
    asks of two sets: how much do they overlap (min-hash resemblance,
    the :func:`kmv_overlap` estimator) and how much would B add on
    top of A (``union_est − est_a``, clamped at 0 — the
    :func:`kmv_novelty` estimator applied per pair; the k smallest of
    the two samples' union is a valid KMV sample of A ∪ B, so the
    union estimate reuses the merged top-k this relation already
    builds for Jaccard).  Everything stays on the ≤ groups·k sketch
    rows; estimates are all-integer (the ``div`` estimator of
    :func:`kmv_estimate`), so the whole relation replays exactly in
    an external SQL engine.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    s = sketch.select(F.col(group_col).alias("g"), "h")
    num = (k - 1) * (1 << 48)
    per = (s.groupBy("g")
           .agg(F.count(F.lit(1)).cast("int").alias("__n"),
                F.max("h").cast("bigint").alias("__kth")))
    est = F.when(F.col("__n") < k, F.col("__n").cast("bigint")) \
        .otherwise(F.expr(f"CAST({num} AS BIGINT) div __kth")) \
        .cast("bigint")
    per = per.select("g", est.alias("__est"))
    groups = s.select("g").distinct()
    pairs = (groups.select(F.col("g").alias("ga"))
             .join(groups.select(F.col("g").alias("gb")),
                   F.col("ga") < F.col("gb")))
    sides = pairs.select(
        "ga", "gb", F.explode(F.array("ga", "gb")).alias("g"))
    u = (sides.join(s, "g")
         .groupBy("ga", "gb", "h")
         .agg(F.max(F.when(F.col("g") == F.col("ga"), 1)
                    .otherwise(0)).alias("in_a"),
              F.max(F.when(F.col("g") == F.col("gb"), 1)
                    .otherwise(0)).alias("in_b")))
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = (u.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k))
    agg = (topk.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).cast("int").alias("n_sample"),
                F.sum((F.col("in_a") * F.col("in_b")).cast("bigint"))
                .cast("int").alias("n_common"),
                F.max("h").cast("bigint").alias("__ukth")))
    uest = F.when(F.col("n_sample") < k,
                  F.col("n_sample").cast("bigint")) \
        .otherwise(F.expr(f"CAST({num} AS BIGINT) div __ukth")) \
        .cast("bigint")
    out = (agg
           .join(F.broadcast(per.select(F.col("g").alias("ga"),
                                        F.col("__est")
                                        .alias("est_a"))), "ga")
           .join(F.broadcast(per.select(F.col("g").alias("gb"),
                                        F.col("__est")
                                        .alias("est_b"))), "gb")
           .withColumn("union_est", uest))
    return out.select(
        "ga", "gb", "n_sample", "n_common",
        F.expr("CAST(1000000 * CAST(n_common AS BIGINT) "
               "div n_sample AS BIGINT)").alias("jaccard_e6"),
        "est_a", "est_b", "union_est",
        F.greatest(F.col("union_est") - F.col("est_a"), F.lit(0))
        .cast("bigint").alias("novelty_ab"),
        F.greatest(F.col("union_est") - F.col("est_b"), F.lit(0))
        .cast("bigint").alias("novelty_ba"))
