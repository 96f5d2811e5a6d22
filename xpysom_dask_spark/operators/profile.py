"""Column-level data profiling — the ingest-audit pass every corpus
onboarding starts with: null counts, exact distinct cardinalities, and
numeric ranges per column, in ONE scan.

Shape: a single wide aggregate (Catalyst plans the multi-distinct via
an Expand — each input row fans to |cols| tagged rows, then one
partial-aggregated exchange), then a driver-side unpivot of the 1-row
result into the (column, metric…) report.  The unpivot touches one row,
so the report never collects data — only aggregates — regardless of
corpus size.  For 100 TB profiling where exact distincts are too hot,
``exact=False`` swaps in ``approx_count_distinct`` (HLL++, no Expand,
one ordinary aggregate) — the documented scale path; the exact mode is
the oracle configuration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str],
                    exact: bool = True) -> DataFrame:
    """Per-column profile: ``column, n_rows, n_nulls, n_distinct,
    min_val, max_val`` (min/max as DOUBLE — profile numeric columns;
    pass none and they come back NULL).

    One aggregate job; the result DataFrame is built driver-side from
    the single aggregate row (|cols| output rows — not a data scan).
    """
    distinct = (F.count_distinct if exact
                else (lambda c: F.approx_count_distinct(c)))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"__nulls_{c}"),
            distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [(c, row["__n"], row[f"__nulls_{c}"], row[f"__nd_{c}"],
            row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows bigint, n_nulls bigint, "
             "n_distinct bigint, min_val double, max_val double")


def numeric_histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Equi-width histogram of a numeric column: ``bin, bin_lo, bin_hi,
    n`` over ``bins`` buckets spanning [min, max] — the distribution
    report behind every profiling dashboard.  The top edge is inclusive
    (the max lands in the last bin); empty bins are absent (join the
    output against ``sequence(0, bins-1)`` to densify).

    Plan: one eager scalar min/max aggregate (two doubles to the
    driver), folded as literals into a codegen'd bin expression, then
    ONE map-side-combined groupBy on the bin id — traffic O(bins).
    Degenerate column (min = max, or all NULL) → single bin / empty.
    """
    bins = int(bins)
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    lo, hi = df.agg(F.min(F.col(col).cast("double")),
                    F.max(F.col(col).cast("double"))).first()
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "bin bigint, bin_lo double, bin_hi double, n bigint")
    width = (hi - lo) / bins if hi > lo else 1.0
    b = F.least(F.lit(bins - 1),
                F.floor((F.col(col).cast("double") - F.lit(lo))
                        / F.lit(width))).cast("bigint")
    return (df.where(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * F.lit(width))
                    .alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * F.lit(width))
                    .alias("bin_hi"),
                    "n"))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over ``cols`` in ONE scan:
    ``col_a, col_b, corr`` for every unordered pair (a < b by list
    order).  All moment sums (Σx, Σx², Σxy) ride a single wide
    aggregate — |cols|·(|cols|+3)/2 partial-combined doubles of shuffle
    traffic, no per-pair pass, no Expand — and the closed-form corr is
    computed driver-side from the one aggregate row.

    When EVERY listed column is integer-typed, the moment sums run in
    exact BIGINT arithmetic — order-independent and bit-stable across
    engines and partitionings (mind int64 range: Σx² must stay under
    2⁶³; pre-scale currency to whole units, not sub-cents).  Any
    float column drops the whole aggregate to DOUBLE sums, which are
    accumulation-order-dependent — fine for a report, not for a
    cross-engine hash gate.
    """
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns, got {cols}")
    import pyspark.sql.types as _T

    all_int = all(isinstance(df.schema[c].dataType,
                             (_T.ByteType, _T.ShortType,
                              _T.IntegerType, _T.LongType))
                  for c in cols)
    ct = "bigint" if all_int else "double"
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [F.sum(F.col(c).cast(ct)).alias(f"__s_{c}"),
                 F.sum(F.col(c).cast(ct) * F.col(c).cast(ct))
                 .alias(f"__ss_{c}")]
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a).cast(ct) * F.col(b).cast(ct))
                        .alias(f"__x_{a}_{b}"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    out = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            if not n:
                out.append((a, b, None))
                continue
            # float conversion points mirror the SQL-oracle formula
            # (CAST each exact term to DOUBLE, then one sqrt+divide)
            num = n * row[f"__x_{a}_{b}"] - row[f"__s_{a}"] * row[f"__s_{b}"]
            da = n * row[f"__ss_{a}"] - row[f"__s_{a}"] ** 2
            db = n * row[f"__ss_{b}"] - row[f"__s_{b}"] ** 2
            out.append(
                (a, b,
                 round(float(num) / math.sqrt(float(da) * float(db)), 6)
                 if da > 0 and db > 0 else None))
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, corr double")


def corpus_diff(a: DataFrame, b: DataFrame, id_col: str,
                fp_col: str) -> DataFrame:
    """Version diff between two corpus snapshots keyed on ``id_col``
    with content fingerprint ``fp_col`` (use ``text.md5_fingerprint``
    upstream): ``id, status`` with status ∈ {added, removed, changed,
    same} — the dataset-ops audit between two builds of the same
    corpus (what did the new crawl/filter change?).

    One full-outer hash join on the id — both sides shuffle once on
    the same key; comparing fingerprints instead of payloads keeps the
    shuffle rows at two hashes each, so diffing a 100 TB corpus moves
    O(rows·32B), not the corpus.  Pair with the summary aggregate for
    the O(4)-row report.
    """
    an = a.select(F.col(id_col).alias("id"), F.col(fp_col).alias("__fa"))
    bn = b.select(F.col(id_col).alias("id"), F.col(fp_col).alias("__fb"))
    j = an.join(bn, "id", "full_outer")
    status = (F.when(F.col("__fa").isNull(), "added")
              .when(F.col("__fb").isNull(), "removed")
              .when(F.col("__fa") == F.col("__fb"), "same")
              .otherwise("changed"))
    return j.select("id", status.alias("status"))


def corpus_diff_summary(a: DataFrame, b: DataFrame, id_col: str,
                        fp_col: str) -> DataFrame:
    """``status, n`` counts over :func:`corpus_diff` — the four-row
    dashboard report (map-side-combined aggregate on the diff)."""
    return (corpus_diff(a, b, id_col, fp_col)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs: tuple = (0.5, 0.9, 0.99), decimals: int = 4,
                    exact: bool = True) -> DataFrame:
    """Per-group value quantiles: ``group, n, q_50, q_90, ...`` — the
    latency/size-distribution report (p50/p90/p99 per endpoint, doc
    length per source, …).

    One map-side-combined groupBy.  ``exact=True`` (the oracle
    configuration) buffers each group's values for the exact
    interpolated percentile — fine while single groups fit an executor;
    ``exact=False`` swaps in ``percentile_approx`` (t-digest sketch,
    mergeable, bounded memory) — the 100 TB path, same output shape.
    """
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    fn = F.percentile if exact else (
        lambda c, q: F.percentile_approx(c, q))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for q in qs:
        name = f"q_{int(q * 100)}" if (q * 100).is_integer() \
            else f"q_{str(q).replace('.', '_')}"
        aggs.append(F.round(fn(F.col(value_col).cast("double"),
                               F.lit(float(q))), decimals).alias(name))
    return (df.groupBy(F.col(group_col).alias("group"))
            .agg(*aggs))


def check_constraints(df: DataFrame,
                      complete: list[str] | tuple = (),
                      unique: list[str] | tuple = (),
                      bounds: dict[str, tuple] | None = None,
                      refs: dict[str, tuple] | None = None) -> DataFrame:
    """Deequ-style data-quality validation, batched for scale:

    * ``complete``: columns that must never be NULL;
    * ``unique``: columns whose values must not repeat;
    * ``bounds``: ``{col: (lo, hi)}`` inclusive value ranges (pass
      ``None`` for an open side);
    * ``refs``: ``{col: (dim_df, dim_col)}`` referential integrity —
      every non-null value must exist in the dimension column.

    Returns ``(rule, col, n_violations, passed)`` — one row per rule.

    Plan: every completeness/uniqueness/bounds rule folds into ONE wide
    aggregate over a single scan (uniqueness via
    ``count(col) − count(DISTINCT col)``, which Catalyst plans through
    the same Expand as the profile audit), so adding rules never adds
    scans.  Each referential rule is one left-anti-join count against
    its dimension — broadcast when the dimension is small, which at
    100 TB is exactly the case where such checks are affordable.  The
    report itself is O(rules) rows built from aggregate scalars; no
    data visits the driver.
    """
    bounds = bounds or {}
    refs = refs or {}
    aggs, labels = [], []
    for c in complete:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")))
        labels.append(("complete", c))
    for c in unique:
        aggs.append(F.count(F.col(c)) - F.count_distinct(F.col(c)))
        labels.append(("unique", c))
    for c, (lo, hi) in bounds.items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        aggs.append(F.sum(cond.cast("bigint")))
        labels.append(("bounds", c))
    rows = []
    if aggs:
        vals = df.agg(*[a.alias(f"m{i}") for i, a in enumerate(aggs)]) \
            .first()
        rows = [(kind, col, int(vals[f"m{i}"] or 0))
                for i, (kind, col) in enumerate(labels)]
    for c, (dim_df, dim_col) in refs.items():
        n_bad = (df.select(F.col(c)).where(F.col(c).isNotNull())
                 .join(dim_df.select(F.col(dim_col).alias(c)).distinct(),
                       c, "left_anti").count())
        rows.append(("ref", c, int(n_bad)))
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(k, c, n, n == 0) for k, c, n in rows],
        "rule string, col string, n_violations bigint, passed boolean")
    return out


def skew_report(df: DataFrame, key_cols, top: int = 20) -> DataFrame:
    """Shuffle-key skew diagnosis: the ``top`` heaviest key groups with
    their row counts and share of the table — the first question every
    slow join/aggregation at scale comes down to ("is one key hot?").

    One map-side-combined aggregate on the key (the same shuffle the
    problematic operator pays, so running this is never worse than the
    thing being debugged).  The counts relation is locally checkpointed
    so its two consumers — a distributed top-k (TakeOrdered, no
    single-partition window) and the grand-total scalar — share one
    data scan; a ``SUM() OVER ()`` grand-total window would instead
    drag EVERY distinct key through one task.  ``share`` and
    ``x_mean`` (ratio to the mean group size) quantify how bad: a key
    with ``x_mean`` in the thousands is a salting / star-join
    candidate (dedup.band_self_join_pairs' ``max_bucket`` et al.).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows")) \
        .localCheckpoint(eager=True)
    tot = counts.agg(F.sum("n_rows").alias("s"),
                     F.avg("n_rows").alias("m")).first()
    return (counts
            .withColumn("share", F.col("n_rows") / F.lit(float(tot["s"])))
            .withColumn("x_mean", F.col("n_rows") / F.lit(float(tot["m"])))
            .orderBy(F.desc("n_rows"), *key_cols)
            .limit(top))


def zscore_by_group(df: DataFrame, group_col: str, value_col: str,
                    id_col: str, decimals: int = 2,
                    threshold: float | None = None) -> DataFrame:
    """Per-row standardized score against the row's OWN group
    distribution: ``(id, group, value, z)`` — the metric-anomaly
    audit (a payment 4σ above its event type, a doc 5σ longer than
    its source's norm).

    Partitioning- and engine-exact by construction: with ``value``
    fixed-point at ``decimals``, the identity
    ``z = (n·vᵢ − Σv) / sqrt(n·Σv² − (Σv)²)`` makes the numerator and
    the radicand EXACT DECIMAL(38,0) integers (the regr_by_group
    idiom) and IEEE sqrt/division are correctly rounded — so z is
    bit-identical on any partitioning and replayable in SQL with no
    tolerance.  Zero-variance groups get NULL z, not a 0/0.

    Plan: one map-side-combinable moments aggregate (|groups| tiny
    rows) broadcast back against the corpus — the big side never
    shuffles; with ``threshold`` the filter lands post-join at scan
    speed."""
    s = 10 ** decimals
    vi = (f"CAST(ROUND(CAST({value_col} AS DOUBLE) * {s}, 0) "
          f"AS DECIMAL(38,0))")
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"), F.expr(vi).alias("vi"))
    mom = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vi").alias("s_v"),
        F.sum(F.expr("vi * vi")).alias("s_vv"))
    z = ("CAST(n * vi - s_v AS DOUBLE) "
         "/ sqrt(nullif(CAST(n * s_vv - s_v * s_v AS DOUBLE), 0.0))")
    out = (base.join(F.broadcast(mom), "grp")
           .select(F.col("id").alias(id_col),
                   F.col("grp").alias(group_col), "value",
                   F.expr(z).alias("z")))
    if threshold is not None:
        out = out.where(F.abs(F.col("z")) >= float(threshold))
    return out


def ks_drift(df_a: DataFrame, df_b: DataFrame, value_col: str,
             decimals: int = 2, round_to: int = 6) -> DataFrame:
    """Two-sample distribution-drift statistics between two snapshots
    of a numeric column: one row
    ``(n_a, n_b, d_num, ks, w1_num, w1)`` where
    ``ks = max_v |F_a(v) − F_b(v)|`` (Kolmogorov–Smirnov: the sharpest
    local shape alarm) and ``w1 = ∫|F_a − F_b| dv`` (Wasserstein-1 /
    earth-mover: the magnitude of the shift in value units — a 1-cent
    uniform shift moves w1 by 0.01 but barely registers on ks) — the
    ingest-monitoring pair a mean/σ check can't replace.

    EXACT by construction: values quantize to ``decimals`` fixed-point
    and both statistics are computed on the integer lattice —
    ``d_num = max_v |n_b·cum_a(v) − n_a·cum_b(v)|`` and
    ``w1_num = Σ_v |n_b·cum_a − n_a·cum_b|·(v_next − v)`` are exact
    BIGINTs (``ks = d_num/(n_a·n_b)`` and
    ``w1 = w1_num/(n_a·n_b·10^decimals)`` are the only floats, emitted
    rounded).  No sampling, no sketch.

    Plan: one map-side-combined ``groupBy(vi)`` per side collapses
    each snapshot to its distinct-value histogram, the outer-joined
    histograms take ONE ordered cumulative window over the DISTINCT
    lattice — cardinality ≤ 10^decimals · range, NOT row count, so the
    single-partition window is bounded by the value domain (the same
    argument as a histogram's bucket count), never by corpus size —
    then a 1-row max.  At 100 TB the shuffles carry only the
    histograms."""
    s = 10 ** decimals
    vi = (f"CAST(ROUND(CAST({value_col} AS DOUBLE) * {s}, 0) "
          f"AS BIGINT)")

    def hist(df, name):
        return (df.where(F.col(value_col).isNotNull())
                .select(F.expr(vi).alias("v"))
                .groupBy("v")
                .agg(F.count(F.lit(1)).cast("bigint").alias(name)))

    ha, hb = hist(df_a, "ca"), hist(df_b, "cb")
    merged = (ha.join(hb, "v", "full_outer")
              .select("v", F.coalesce("ca", F.lit(0)).alias("ca"),
                      F.coalesce("cb", F.lit(0)).alias("cb")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wlead = Window.orderBy("v")
    cum = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        # lattice gap to the next observed value: the |F_a−F_b| plateau
        # between them has this width (0 on the last row closes the
        # integral — beyond max(v) both CDFs are 1)
        (F.coalesce(F.lead("v").over(wlead), F.col("v")) - F.col("v"))
        .alias("gap"))
    # the totals ARE the final cumulative values (monotone prefix
    # sums), so a second unbounded window over the same tiny lattice
    # relation replaces any totals join — no BNLJ, one stage
    w_all = Window.partitionBy(F.lit(1))
    return (cum.select(
        "gap", "cum_a", "cum_b",
        F.max("cum_a").over(w_all).cast("bigint").alias("n_a"),
        F.max("cum_b").over(w_all).cast("bigint").alias("n_b"))
        .select(
            "n_a", "n_b", "gap",
            F.abs(F.col("n_b") * F.col("cum_a")
                  - F.col("n_a") * F.col("cum_b")).alias("d"))
        .groupBy("n_a", "n_b")
        .agg(F.max("d").cast("bigint").alias("d_num"),
             F.sum(F.col("d") * F.col("gap")).cast("bigint")
             .alias("w1_num"))
        .select(
            "n_a", "n_b", "d_num",
            F.round(F.col("d_num").cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double"),
                    round_to).alias("ks"),
            "w1_num",
            F.round(F.col("w1_num").cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                    / F.lit(float(s)), round_to).alias("w1")))


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 decimals: int = 2,
                 threshold_e4: int = 44478) -> DataFrame:
    """Per-group ROBUST outlier profile — the median/MAD twin of
    :func:`zscore_outliers` for the heavy-tailed columns where mean/σ
    are themselves dragged by the outliers they should flag:
    ``(group, n, med_i, mad_i, n_outliers)`` with ``med_i`` the group
    median, ``mad_i`` the median absolute deviation (both on the
    ``decimals`` fixed-point integer lattice), and ``n_outliers`` the
    count of rows with ``10^4 · |v_i − med| > threshold_e4 · mad``
    (default 44478 = 3 · 1.4826e4, the 3σ-equivalent under normality
    via the MAD consistency constant — as an exact integer rule).

    EXACT by construction: the LOWER-median convention (the
    ``ceil(n/2)``-th smallest lattice value — deterministic, no
    even-count interpolation) makes med, mad, and the outlier count
    pure integer functions of the data, bit-reproducible on any
    partitioning and replayable in SQL with no tolerance.  Groups
    where MAD = 0 (≥ half the values identical) degenerate to "any
    deviation flags" — the standard MAD caveat, documented rather
    than patched.

    Plan: ONE map-side-combined ``groupBy(group, v_i)`` collapses the
    corpus to per-group distinct-value histograms (the ks_drift
    lattice argument: cardinality ≤ 10^decimals · range, never row
    count); medians come from a per-group-keyed cumulative window
    over that bounded relation, the deviation histogram derives from
    it by arithmetic + re-aggregation, and the outlier count is one
    filtered sum — the corpus is scanned once and never shuffled by
    row."""
    s = 10 ** decimals
    vi = (f"CAST(ROUND(CAST({value_col} AS DOUBLE) * {s}, 0) "
          f"AS BIGINT)")
    # eager checkpoints (optimization r12, guide §1.2): the lattice
    # histogram h feeds three subtrees of the final report (median,
    # deviation histogram, and the median's reuse in the close) and
    # dev feeds two (mad, outlier count) — as sibling subtrees of ONE
    # action, a lazy checkpoint is computed once per sibling, so the
    # corpus scan ran up to 3×.  Both relations are bounded at
    # groups × lattice-values rows.
    h = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("grp"), F.expr(vi).alias("v"))
         .groupBy("grp", "v")
         .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
         .localCheckpoint(eager=True))

    def lower_median(hist):
        """(grp, med) from a (grp, v, c) histogram: the
        ceil(n/2)-th smallest value."""
        wg = Window.partitionBy("grp")
        wc = Window.partitionBy("grp").orderBy("v") \
            .rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select(
            "grp", "v", "c",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wg).alias("n"))
        return (cum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
                .groupBy("grp")
                .agg(F.min("v").alias("med"),
                     F.max("n").alias("n")))

    med = lower_median(h)
    dev = (h.join(med.select("grp", "med"), "grp")
           .select("grp", F.abs(F.col("v") - F.col("med")).alias("v"),
                   "c")
           .groupBy("grp", "v")
           .agg(F.sum("c").cast("bigint").alias("c"))
           .localCheckpoint(eager=True))
    mad = lower_median(dev).select(
        "grp", F.col("med").alias("mad"))
    out = (dev.join(F.broadcast(mad), "grp")
           .groupBy("grp")
           .agg(F.sum(F.when(
               F.col("v") * 10000 > F.lit(int(threshold_e4))
               * F.col("mad"), F.col("c")).otherwise(F.lit(0)))
               .cast("bigint").alias("n_outliers")))
    return (med.join(mad, "grp").join(out, "grp")
            .select(F.col("grp").alias(group_col),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("med").cast("bigint").alias("med_i"),
                    F.col("mad").cast("bigint").alias("mad_i"),
                    "n_outliers"))


def psi_drift(df_a: DataFrame, df_b: DataFrame, value_col: str,
              lo: float, hi: float, bins: int = 20,
              group_cols: tuple = ()) -> DataFrame:
    """Population Stability Index terms between two snapshots of a
    numeric column over a fixed ``[lo, hi)`` ``bins``-bucket grid:
    ``(bin, ca, cb, n_a, n_b, term_e6)`` — one row per bucket, where
    ``psi = Σ term`` with
    ``term = (p_a − p_b) · ln(p_a / p_b)`` and Laplace-smoothed
    proportions ``p_x = (c_x + 1) / (n_x + bins)`` (the smoothing makes
    empty buckets well-defined without the ad-hoc ε the textbook
    formula needs; documented variant).  PSI is the production
    score-drift monitor the KS/W1 pair (:func:`ks_drift`) complements:
    banded alarms at 0.1 / 0.25 are the industry convention.

    Exactness: bucket counts are exact BIGINTs off the
    :func:`~..operators.sketches.histogram_sketch` grid; each term is
    ONE subtraction, one ln of a ratio of exact ≤ 2^53 integer
    products, and one multiply in IEEE doubles — the
    hll_distinct/lm_score parity class — shipped floor-scaled e6.

    Plan: two map-side-combined histogram aggregations (the corpus
    never shuffles rows — only the ≤ groups·bins-row cell relations
    move); the spine join, totals window, and term arithmetic all run
    on the bounded cell relation, so the windows are bounded by the
    grid, never the corpus.

    ``group_cols``: monitor one PSI per group (e.g. per event_type /
    per source) — the spine becomes (observed groups × bins) via an
    explode (no cartesian join), totals partition per group, and the
    output gains the group columns.  A group present on only one side
    still gets rows (the union'd group spine) with the smoothed terms
    reflecting the one-sided mass."""
    from .sketches import histogram_sketch

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    g = list(group_cols)
    ha = (histogram_sketch(df_a, value_col, lo, hi, bins,
                           group_cols=tuple(g))
          .withColumnRenamed("count", "ca"))
    hb = (histogram_sketch(df_b, value_col, lo, hi, bins,
                           group_cols=tuple(g))
          .withColumnRenamed("count", "cb"))
    bins_seq = F.explode(F.sequence(F.lit(0), F.lit(bins - 1)))
    if g:
        groups = (df_a.select(*g).unionByName(df_b.select(*g))
                  .distinct())
        spine = (groups.select(*g, bins_seq.alias("__b"))
                 .select(*g, F.col("__b").cast("int").alias("bin")))
    else:
        spine = (df_a.sparkSession.range(1)
                 .select(bins_seq.alias("__b"))
                 .select(F.col("__b").cast("int").alias("bin")))
    keys = g + ["bin"]
    m = (spine.join(ha, keys, "left").join(hb, keys, "left")
         .select(*keys,
                 F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
                 F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb")))
    return psi_terms_from_cells(m, bins, group_cols=tuple(g))


def psi_terms_from_cells(m: DataFrame, bins: int,
                         group_cols: tuple = ()) -> DataFrame:
    """Totals + smoothed-PSI-term arithmetic over a COMPLETED
    ``(*group_cols, bin, ca, cb)`` cell relation (every spine bin
    present, counts coalesced to 0) — the shared tail of
    :func:`psi_drift` and the drained streaming monitor
    (``streaming.psi_stream``), factored out so batch and streaming
    derive from literally the same expressions.  Constant-time: the
    input is ≤ groups·bins rows by construction."""
    g = list(group_cols)
    keys = g + ["bin"]
    w_all = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    t = m.select(
        *keys, "ca", "cb",
        F.sum("ca").over(w_all).cast("bigint").alias("n_a"),
        F.sum("cb").over(w_all).cast("bigint").alias("n_b"))
    pa = f"(CAST(ca + 1 AS DOUBLE) / CAST(n_a + {bins} AS DOUBLE))"
    pb = f"(CAST(cb + 1 AS DOUBLE) / CAST(n_b + {bins} AS DOUBLE))"
    ratio = (f"(CAST((ca + 1) * (n_b + {bins}) AS DOUBLE) / "
             f"CAST((cb + 1) * (n_a + {bins}) AS DOUBLE))")
    return t.select(
        *keys, "ca", "cb", "n_a", "n_b",
        F.expr(f"CAST(FLOOR(({pa} - {pb}) * ln({ratio}) "
               "* 1000000.0 + 0.5) AS BIGINT)").alias("term_e6"))


def regr_by_group(df: DataFrame, group_col: str, x_col: str, y_col: str,
                  x_decimals: int = 0, y_decimals: int = 2,
                  round_to: int = 6) -> DataFrame:
    """Per-group least-squares line fit ``y ≈ intercept + slope·x`` —
    the calibration/trend profile (drift of engagement value vs
    payload size per event type, quality vs length per source, …):
    ``(group, n, slope, intercept, r2)``.

    Partitioning-independent by the repo's scaled-BIGINT idiom (the
    TPC-H money-sum rule): ``x``/``y`` are fixed-point with
    ``x_decimals``/``y_decimals``, so every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer sum in
    DECIMAL(38,0) — no accumulation-order drift across partition
    counts or engines — and floating point enters only in the final
    closed-form division.  One map-side-combinable aggregate, one
    shuffle keyed by the group.

    Degenerate groups (constant x: zero variance) get NULL slope /
    intercept / r2 rather than an Inf/NaN surprise; ``r2`` is also
    NULL for constant y (0/0).
    """
    sx = 10 ** x_decimals
    sy = 10 ** y_decimals
    xi = (f"CAST(ROUND(CAST({x_col} AS DOUBLE) * {sx}, 0) "
          f"AS DECIMAL(38,0))")
    yi = (f"CAST(ROUND(CAST({y_col} AS DOUBLE) * {sy}, 0) "
          f"AS DECIMAL(38,0))")
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()) \
        .select(F.col(group_col).alias("grp"),
                F.expr(xi).alias("xi"), F.expr(yi).alias("yi"))
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("s_x"), F.sum("yi").alias("s_y"),
        F.sum(F.expr("xi * yi")).alias("s_xy"),
        F.sum(F.expr("xi * xi")).alias("s_xx"),
        F.sum(F.expr("yi * yi")).alias("s_yy"))
    # exact-integer numerators/denominators, ONE double division each;
    # un-scale: slope in y/x units multiplies by sx/sy, intercept by 1/sy
    cov_n = "CAST(n * s_xy - s_x * s_y AS DOUBLE)"
    var_x = "CAST(n * s_xx - s_x * s_x AS DOUBLE)"
    var_y = "CAST(n * s_yy - s_y * s_y AS DOUBLE)"
    slope = f"({cov_n} / nullif({var_x}, 0.0)) * {sx}.0 / {sy}.0"
    r2 = (f"({cov_n} * {cov_n}) "
          f"/ nullif({var_x} * {var_y}, 0.0)")
    return (agg.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.expr(slope), round_to).alias("slope"),
        F.round(F.expr(f"CAST(s_y AS DOUBLE) / ({sy}.0 * n) - ({slope}) "
                       f"* CAST(s_x AS DOUBLE) / ({sx}.0 * n)"),
                round_to).alias("intercept"),
        F.round(F.expr(r2), round_to).alias("r2")))


def ewma_weights(alpha: float, lag: int) -> list:
    """The truncated-EWMA weight vector ``w_k = (1-α)^k`` for
    ``k = 0..lag-1``, computed once in Python and embedded as LITERALS
    on both engines — repeated ``pow()`` is the one place IEEE doesn't
    guarantee cross-engine bit-parity, so neither side computes it."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    w, cur = [], 1.0
    for _ in range(lag):
        w.append(cur)
        cur *= (1.0 - alpha)
    return w


def ewma(df: DataFrame, key_col: str, value_col: str, ts_col: str,
         id_col: str, alpha: float = 0.25, lag: int = 32,
         decimals: int = 6, out_col: str = "ewma") -> DataFrame:
    """Per-key truncated exponentially-weighted moving average —
    the drift/level smoother for metric streams:
    ``ewma_n = Σ_{j=0..m-1} w_j · x_{n-j} / Σ_{j=0..m-1} w_j`` with
    ``w_j = (1-α)^j`` over the last ``m = min(lag, rows so far)``
    observations, ordered by ``(ts, id)``.  Truncation at ``lag`` is
    what makes the operator exact AND bounded: the infinite-memory
    recurrence needs either per-row recursion (unshippable) or
    ``(1-α)^-n`` rescaling (overflows double by n≈700), while the
    lag-window form is a fixed-size weighted dot product per row whose
    weights are shared literals (:func:`ewma_weights`) — deterministic
    and bit-replayable by an external SQL engine.

    Output: ``id, key, value, ewma`` (rounded to ``decimals``).

    Plan: ONE window per key ordered (ts, id) with a
    ``ROWS lag-1 PRECEDING`` frame collecting the frame values
    (``collect_list`` preserves frame order), then a codegen'd indexed
    fold — ascending frame position on both engines, so summation
    order is pinned.  The shuffle is keyed by ``key_col`` only; each
    key's series must fit one task's ordering, the standard per-key
    time-series contract.
    """
    w = ewma_weights(alpha, lag)
    w_lit = F.array(*[F.lit(float(x)) for x in w])
    # NULL values are dropped BEFORE the window: collect_list silently
    # skips NULLs, which would shift every later observation against
    # the weight vector — excluding the row entirely keeps lag
    # alignment honest (a gap contributes nothing, same as ts gaps).
    # NULL timestamps are dropped too: they have no position in a
    # time-ordered series, and the engines disagree on where they sort
    # (Spark ASC = NULLS FIRST, DuckDB/ANSI default = NULLS LAST) —
    # keeping them would silently diverge the whole key's EWMA
    base = df.where(F.col(value_col).isNotNull()
                    & F.col(ts_col).isNotNull()) \
        .select(F.col(id_col).alias("id"),
                F.col(key_col).alias("key"),
                F.col(value_col).alias("value"),
                F.col(ts_col).alias("__ts"))
    win = (Window.partitionBy("key")
           .orderBy(F.col("__ts").asc(), F.col("id").asc())
           .rowsBetween(-(lag - 1), 0))
    frame = base.withColumn(
        "__fr", F.collect_list(F.col("value").cast("double")).over(win))
    # frame order is oldest..current: x_{n-j} sits at position m-1-j,
    # so weight for 0-based position p is w[m-1-p]; fold ascending p
    m = F.size("__fr")
    num = F.aggregate(
        F.transform(F.sequence(F.lit(0), m - 1),
                    lambda p: F.element_at("__fr", p + 1)
                    * F.element_at(w_lit, m - p)),
        F.lit(0.0), lambda a, x: a + x)
    den = F.aggregate(
        F.transform(F.sequence(F.lit(0), m - 1),
                    lambda p: F.element_at(w_lit, p + 1)),
        F.lit(0.0), lambda a, x: a + x)
    return (frame.withColumn(out_col, F.round(num / den, decimals))
            .select("id", "key", "value", out_col))


def zipf_fit(df: DataFrame, text_col: str, id_col: str,
             top_k: int = 100, decimals: int = 6) -> DataFrame:
    """Zipf-law fit of the corpus frequency head: ONE row
    ``(k, slope, intercept, r2)`` from an exact OLS of ``ln(freq)`` on
    ``ln(rank)`` over the top-``top_k`` vocabulary — the corpus-health
    fingerprint (natural language sits near slope −1; OCR junk,
    templated spam, and synthetic data bend the curve long before a
    human reads a sample).

    Engine-exact double math without DECIMAL moments: plain ``SUM()``
    over floats has no defined order, so every moment (Σx, Σy, Σx²,
    Σxy, Σy²) is a LEFT FOLD over the rank-sorted (rank, x, y) array —
    both engines accumulate in identical order, ln is the established
    lm-score parity class, and the closed-form slope/intercept/r² are
    fixed op sequences.  The fold array is ``top_k`` structs — a
    driver-scale constant, not corpus-scale.

    Plan: token explode → map-side-combined ``groupBy(term)`` → top-k
    (TakeOrderedAndProject) → ONE single-partition window over the
    k-row head (the bounded-domain window rule) → one 1-row aggregate.
    """
    from .text import tokens as _tokens

    if top_k < 3:
        raise ValueError(f"top_k must be >= 3, got {top_k}")
    toks = df.select(F.explode(_tokens(text_col)).alias("term"))
    vocab = (toks.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
             .orderBy(F.col("n").desc(), F.col("term"))
             .limit(int(top_k)))
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    ranked = vocab.withColumn("rank", F.row_number().over(w)) \
        .select("rank",
                F.log(F.col("rank").cast("double")).alias("x"),
                F.log(F.col("n").cast("double")).alias("y"))
    arr = F.array_sort(F.collect_list(F.struct("rank", "x", "y")))

    def fold(expr):
        return F.aggregate(arr, F.lit(0.0),
                           lambda a, s: a + expr(s))

    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        fold(lambda s: s.getField("x")).alias("sx"),
        fold(lambda s: s.getField("y")).alias("sy"),
        fold(lambda s: s.getField("x") * s.getField("x")).alias("sxx"),
        fold(lambda s: s.getField("x") * s.getField("y")).alias("sxy"),
        fold(lambda s: s.getField("y") * s.getField("y")).alias("syy"))
    kd = F.col("k").cast("double")
    num = kd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = kd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (F.col("sy") - slope * F.col("sx")) / kd
    r2 = (num * num) / (den * (kd * F.col("syy")
                               - F.col("sy") * F.col("sy")))
    return agg.select(
        "k", F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2, decimals).alias("r2"))


def parquet_layout_report(spark, path: str) -> DataFrame:
    """Physical-layout audit of a parquet dataset — per file:
    ``(file, size_bytes, n_rows, n_row_groups, min_rg_rows,
    max_rg_rows, avg_rg_bytes, n_columns, compressions)`` — the health
    check behind every 100 TB layout decision: row groups are the scan
    parallelism quantum (``spark.sql.files.maxPartitionBytes`` splits
    BETWEEN row groups, never inside one), so a table of 2 GB
    row groups scans at 1/16 the achievable parallelism and a table of
    10k tiny files drowns the driver in scheduling — both visible here
    and in neither case in any logical plan.

    Footer-only: each task reads its files' parquet FOOTERS via
    pyarrow (kilobytes per file, never data pages), parallelized over
    the file list — auditing a 100 TB table costs seconds.  Derive the
    dataset summary with one ``agg`` (small-file count, rowgroup-size
    quantiles); pair with ``skew_report`` for the value-side story.
    """
    from ..plans.exchange import ship_package

    ship_package(spark)
    import pandas as pd

    files = spark.read.parquet(path).inputFiles()
    if not files:
        raise ValueError(f"parquet_layout_report: no files under "
                         f"{path!r}")

    def fn(batches):
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for uri in pdf["file"]:
                # resolve through pyarrow's filesystem layer so the
                # audit works where 100 TB tables actually live
                # (hdfs://, s3a://->s3, gs://, abfs://), not only on
                # file:// — scheme-less paths fall back to local
                scheme = uri.replace("s3a://", "s3://", 1) \
                    if uri.startswith("s3a://") else uri
                fs, fpath = pafs.FileSystem.from_uri(scheme) \
                    if "://" in scheme \
                    else (pafs.LocalFileSystem(), scheme)
                info = fs.get_file_info(fpath)
                with fs.open_input_file(fpath) as fh:
                    md = pq.ParquetFile(fh).metadata
                rg_rows = [md.row_group(i).num_rows
                           for i in range(md.num_row_groups)]
                rg_bytes = [md.row_group(i).total_byte_size
                            for i in range(md.num_row_groups)]
                comps = sorted({
                    md.row_group(i).column(j).compression
                    for i in range(md.num_row_groups)
                    for j in range(md.num_columns)}) or ["NONE"]
                rows.append((
                    uri, int(info.size),
                    int(md.num_rows), int(md.num_row_groups),
                    int(min(rg_rows)) if rg_rows else 0,
                    int(max(rg_rows)) if rg_rows else 0,
                    int(sum(rg_bytes) / len(rg_bytes))
                    if rg_bytes else 0,
                    int(md.num_columns), ",".join(comps)))
            yield pd.DataFrame(rows, columns=[
                "file", "size_bytes", "n_rows", "n_row_groups",
                "min_rg_rows", "max_rg_rows", "avg_rg_bytes",
                "n_columns", "compressions"])

    flist = spark.createDataFrame([(f,) for f in files], "file string") \
        .repartition(min(len(files), 64))
    return flist.mapInPandas(
        fn, "file string, size_bytes bigint, n_rows bigint, "
            "n_row_groups int, min_rg_rows bigint, max_rg_rows bigint, "
            "avg_rg_bytes bigint, n_columns int, compressions string")


#: Spark dtypes the footer auditors' integer-only contract accepts
_INT_DTYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_integer_columns(fn_name, rel, cols):
    """r11 ADVICE: the audited columns' integer-only contract was
    documented but only enforced by an opaque executor-side
    ``int(st.min)`` failure (or worse, a silent bytes-vs-int
    miscompare for string stats) — check the Spark dtype driver-side
    and fail with actionable coordinates instead."""
    dtypes = dict(rel.dtypes)
    bad = [(c, dtypes[c]) for c in cols if dtypes[c] not in _INT_DTYPES]
    if bad:
        raise ValueError(
            f"{fn_name}: integer-typed columns only (footer min/max "
            f"compare and replay as BIGINT); got {bad} — cast or "
            f"choose an integer column")


def parquet_pruning_audit(spark, path: str, col: str,
                          lo, hi) -> DataFrame:
    """Footer-stats pruning audit: for the range predicate
    ``lo <= col <= hi``, how much of the table would a stats-aware
    scan actually SKIP?  Per file: ``(file, n_row_groups, n_rows,
    rg_pruned, rows_pruned, bytes_pruned, rg_no_stats)`` — a row group
    is *pruned* iff its footer min/max for ``col`` is disjoint from
    ``[lo, hi]`` (exactly the row-group skipping rule Spark's parquet
    reader and every other stats-aware engine applies); a row group
    with no stats for the column can never be skipped and is counted
    separately (``rg_no_stats`` > 0 means the writer dropped
    statistics — fix the writer, no layout will help).

    This is the MEASUREMENT behind every 100 TB layout decision that
    ``zorder_key`` / ``write_zordered`` / partitioning make: pushdown
    only turns into skipped IO when values are clustered so row-group
    ranges are narrow.  Random layout → every group straddles the
    predicate → 0% pruned at any selectivity; sorted/z-ordered layout
    → pruned fraction ≈ 1 − selectivity.  Footer-only like
    :func:`parquet_layout_report`: kilobytes per file through
    pyarrow.fs, parallelized over the file list, data pages never
    open — auditing a 100 TB table costs seconds.

    Aggregate with ``SUM(rows_pruned)/SUM(n_rows)`` for the dataset
    pruning ratio; compare the same predicate across two layouts to
    grade a re-cluster before paying for it.
    """
    return parquet_pruning_audit_multi(spark, path, [col], lo, hi) \
        .drop("column")


def parquet_pruning_audit_multi(spark, path: str, cols,
                                lo, hi) -> DataFrame:
    """:func:`parquet_pruning_audit` for SEVERAL columns in one footer
    pass — ``(file, column, n_row_groups, n_rows, rg_pruned,
    rows_pruned, bytes_pruned, rg_no_stats)``, one row per
    (file, column).  Each footer is opened once regardless of how
    many columns are audited (round-12: the footer_stats gate widening
    audits 4 columns; 4 separate jobs cost 4 footer walks + 4 job
    launches for metadata that one walk already holds)."""
    import pandas as pd

    cols = list(cols)
    rel = spark.read.parquet(path)
    files = rel.inputFiles()
    if not files:
        raise ValueError(f"parquet_pruning_audit: no files under "
                         f"{path!r}")
    missing = [c for c in cols if c not in rel.columns]
    if missing:
        raise ValueError(f"parquet_pruning_audit: column {missing} not "
                         f"in {path} (has {rel.columns[:8]}...)")
    _require_integer_columns("parquet_pruning_audit", rel, cols)
    from ..plans.exchange import ship_package

    ship_package(spark)

    def fn(batches):
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for uri in pdf["file"]:
                scheme = uri.replace("s3a://", "s3://", 1) \
                    if uri.startswith("s3a://") else uri
                fs, fpath = pafs.FileSystem.from_uri(scheme) \
                    if "://" in scheme \
                    else (pafs.LocalFileSystem(), scheme)
                with fs.open_input_file(fpath) as fh:
                    md = pq.ParquetFile(fh).metadata
                    names = md.schema.names
                    for col in cols:
                        ci = names.index(col)
                        n_rows = rg_pruned = rows_pruned = 0
                        bytes_pruned = no_stats = 0
                        for i in range(md.num_row_groups):
                            rg = md.row_group(i)
                            n_rows += rg.num_rows
                            st = rg.column(ci).statistics
                            if (st is None or not st.has_min_max):
                                no_stats += 1
                                continue
                            if st.max < lo or st.min > hi:
                                rg_pruned += 1
                                rows_pruned += rg.num_rows
                                bytes_pruned += rg.total_byte_size
                        rows.append((uri, col, md.num_row_groups,
                                     n_rows, rg_pruned, rows_pruned,
                                     bytes_pruned, no_stats))
            yield pd.DataFrame(rows, columns=[
                "file", "column", "n_row_groups", "n_rows",
                "rg_pruned", "rows_pruned", "bytes_pruned",
                "rg_no_stats"])

    flist = spark.createDataFrame([(f,) for f in files], "file string") \
        .repartition(min(len(files), 64))
    return flist.mapInPandas(
        fn, "file string, column string, n_row_groups int, "
            "n_rows bigint, rg_pruned int, rows_pruned bigint, "
            "bytes_pruned bigint, rg_no_stats int")


def parquet_column_stats(spark, path: str, columns) -> DataFrame:
    """Per-column footer statistics rolled up across every row group
    and file: ``(column, n_row_groups, n_values, null_count, min_val,
    max_val)`` for integer-typed ``columns`` (min/max as BIGINT so the
    relation replays exactly in any engine).  The raw material of
    :func:`parquet_pruning_audit` exposed as its own relation — what
    the footers CLAIM about the data, checkable against what the data
    says (a mismatch means a broken writer, the nastiest kind of silent
    corruption because stats-aware scans will silently skip live rows).

    Footer-only via pyarrow.fs (kilobytes per file, remote-FS capable),
    parallelized over the file list; the rollup is one tiny groupBy on
    the column name.
    """
    import pandas as pd

    cols = list(columns)
    rel = spark.read.parquet(path)
    missing = [c for c in cols if c not in rel.columns]
    if missing:
        raise ValueError(f"parquet_column_stats: {missing} not in "
                         f"{path} (has {rel.columns[:8]}...)")
    _require_integer_columns("parquet_column_stats", rel, cols)
    files = rel.inputFiles()
    if not files:
        raise ValueError(f"parquet_column_stats: no files under "
                         f"{path!r}")
    from ..plans.exchange import ship_package

    ship_package(spark)

    def fn(batches):
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for uri in pdf["file"]:
                scheme = uri.replace("s3a://", "s3://", 1) \
                    if uri.startswith("s3a://") else uri
                fs, fpath = pafs.FileSystem.from_uri(scheme) \
                    if "://" in scheme \
                    else (pafs.LocalFileSystem(), scheme)
                with fs.open_input_file(fpath) as fh:
                    md = pq.ParquetFile(fh).metadata
                    names = md.schema.names
                    for c in cols:
                        ci = names.index(c)
                        for i in range(md.num_row_groups):
                            cc = md.row_group(i).column(ci)
                            st = cc.statistics
                            rows.append((
                                c, cc.num_values,
                                int(st.null_count)
                                if st is not None
                                and st.null_count is not None else 0,
                                int(st.min) if st is not None
                                and st.has_min_max else None,
                                int(st.max) if st is not None
                                and st.has_min_max else None))
            yield pd.DataFrame(rows, columns=[
                "column", "n_values", "null_count", "min_val",
                "max_val"])

    flist = spark.createDataFrame([(f,) for f in files], "file string") \
        .repartition(min(len(files), 64))
    per_rg = flist.mapInPandas(
        fn, "column string, n_values bigint, null_count bigint, "
            "min_val bigint, max_val bigint")
    return (per_rg.groupBy("column")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
                 F.sum("n_values").cast("bigint").alias("n_values"),
                 F.sum("null_count").cast("bigint").alias("null_count"),
                 F.min("min_val").alias("min_val"),
                 F.max("max_val").alias("max_val")))
