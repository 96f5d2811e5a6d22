"""Deterministic sampling, splitting, and mixture construction.

Training-data pipelines need *reproducible* row selection: the same
document must land in the same split/sample no matter how the corpus is
partitioned, which executor reads it, or how many times the job reruns.
``df.sample()`` can't promise that (partition-seeded RNG → layout-
dependent), so every operator here derives its decision from a content
hash of a stable key:

    u(id) = (first 12 md5 nibbles of "seed:id") / 2^48   ∈ [0, 1)

One JVM-codegen'd expression per row — narrow, no shuffle, no Python,
pushes through any scan — and bit-identical in the DuckDB oracle twin
(same md5, same nibbles).  48 bits keeps the quantization error of the
uniform at 2⁻⁴⁸ — far below any practical sampling rate.

Operators:

* ``hash_sample`` — keep a deterministic ``fraction`` of rows.
* ``split_by_hash`` — label rows train/val/test (arbitrary named
  weights) by hash range; splits are disjoint, exhaustive, and stable
  under corpus growth (a row's split never changes when other rows are
  added — the property random shuffles lack).
* ``stratified_sample`` — per-stratum sampling rates (e.g. downsample
  crawl, keep all books): the mixture-construction primitive.

All three are pure filters/projections: at 100 TB they cost one scan
with the predicate pushed into it, and compose with partition pruning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^48 — the hash-uniform's denominator
_HASH_SPACE = 1 << 48


def _unit_hash(id_col: str, seed: int):
    """Column: deterministic uniform in [0, 1) from (seed, id)."""
    h = (f"CAST(conv(substring(md5(concat('{seed}', ':', "
         f"CAST({id_col} AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    return F.expr(h) / F.lit(float(_HASH_SPACE))


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                seed: int = 0) -> DataFrame:
    """Deterministic ``fraction``-sample keyed on ``id_col``.

    Every run, engine, and partitioning selects the SAME rows; the
    selection is also a subset-chain: the 1% sample is contained in the
    10% sample at the same seed (hash threshold grows monotonically) —
    the property that makes staged scale-up experiments comparable.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_unit_hash(id_col, seed) < fraction)


def split_by_hash(df: DataFrame, id_col: str, weights: dict[str, float],
                  seed: int = 0, out_col: str = "split") -> DataFrame:
    """Append ``out_col`` labeling each row with a split name, by hash
    range over normalized ``weights`` (e.g. {"train": .98, "val": .01,
    "test": .01}).  Disjoint and exhaustive by construction; a row's
    label is a pure function of (seed, id) so it never migrates between
    splits when the corpus grows or repartitions.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    total = float(sum(weights.values()))
    u = _unit_hash(id_col, seed)
    names = list(weights)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict, seed: int = 0,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive:
    ``fractions`` maps stratum value → keep-rate; strata not listed keep
    ``default_fraction`` (0 drops them).  Rates > 1 are rejected
    (upsampling means *repeating* rows — do that with an explicit
    explode so the duplication is visible in the plan, not silently in
    a sampler).
    """
    for v, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {v!r} must be in "
                             f"[0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], "
                         f"got {default_fraction}")
    u = _unit_hash(id_col, seed)
    rate = None
    for v, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(v)
        rate = (F.when(cond, F.lit(float(frac))) if rate is None
                else rate.when(cond, F.lit(float(frac))))
    rate = (F.lit(float(default_fraction)) if rate is None
            else rate.otherwise(F.lit(float(default_fraction))))
    return df.where(u < rate)


def mixture_report(df: DataFrame, strata_col: str,
                   weight_col: str | None = None) -> DataFrame:
    """(stratum, n_rows, share) — the post-mix sanity check, one
    map-side-combinable aggregation.  ``weight_col`` (e.g. a token
    count) switches the share basis from rows to weights."""
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    agg = df.groupBy(strata_col).agg(w.cast("double").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return agg.select(F.col(strata_col),
                      F.col("n").cast("bigint").alias("n_rows"),
                      (F.col("n") / total).alias("share"))


def mixture_resample(df: DataFrame, id_col: str, strata_col: str,
                     factors: dict, seed: int = 0,
                     default_factor: float = 1.0,
                     copy_col: str = "copy_id") -> DataFrame:
    """Deterministic fractional resampling — the epoch-repetition form
    of mixture weights ("books ×2.5, crawl ×0.3"): every row gets
    ``floor(f)`` full copies plus one extra for the hash-selected
    ``f − floor(f)`` share of its stratum.  ``f < 1`` therefore
    downsamples (0 or 1 copies), ``f > 1`` upsamples — one operator,
    and the repetition is explicit in the output (``copy_col``
    numbers the copies) and in the plan (an explode), never hidden
    inside a sampler.

    Pure narrow expressions: the fan-out is the explode of a
    per-row-sized sequence; no shuffle, no Python, deterministic under
    repartitioning (same hash uniform as the rest of this module).
    """
    for v, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for stratum {v!r} must be >= 0, "
                             f"got {f}")
    if default_factor < 0:
        raise ValueError(f"default_factor must be >= 0, "
                         f"got {default_factor}")
    u = _unit_hash(id_col, seed)
    rate = None
    for v, f in factors.items():
        cond = F.col(strata_col) == F.lit(v)
        rate = (F.when(cond, F.lit(float(f))) if rate is None
                else rate.when(cond, F.lit(float(f))))
    rate = (F.lit(float(default_factor)) if rate is None
            else rate.otherwise(F.lit(float(default_factor))))
    n = (F.floor(rate) + F.when(u < rate - F.floor(rate), 1)
         .otherwise(0)).cast("int")
    # NB: Spark sequence(1, 0) yields a DESCENDING [1, 0] — guard the
    # zero-copy case explicitly (the word_shingles lesson)
    copies = F.when(n >= 1, F.expr(f"sequence(1, {'__n'})")) \
        .otherwise(F.array().cast("array<int>"))
    return (df.withColumn("__n", n)
            .withColumn(copy_col, F.explode(copies))
            .drop("__n"))


def importance_sample(df: DataFrame, id_col: str, weight_col: str,
                      fraction: float, seed: int = 0) -> DataFrame:
    """Deterministic weight-proportional sampling: row *i* is kept with
    probability min(1, fraction · wᵢ / w̄) — rows twice the mean weight
    are kept twice as often, and the expected kept-fraction is
    ``fraction`` (exactly, when no per-row probability clips at 1).

    The quality-weighted curation primitive: weight by a quality score
    and the sample tilts toward high-quality documents without a sort
    or a global rank.  Decision is the same content-hash uniform as
    ``hash_sample`` (reproducible under any partitioning); the mean
    weight is ONE scalar aggregate broadcast back into the filter, so
    the whole plan is two scans — aggregate + filtered scan — with the
    filter codegen'd into the second.

    For cross-engine bit-parity use an integer ``weight_col`` (BIGINT
    sums are exact; float sums are accumulation-order-dependent).

    NB: the mean-weight aggregate runs EAGERLY at call time (one
    scalar job) and is folded into the filter as a literal — the
    returned plan is then a pure codegen'd filter in the scan stage
    (no 1-row join node), same as ``hash_sample``.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    wsum, wn = df.agg(
        F.sum(F.col(weight_col).cast("bigint")),
        F.count(F.lit(1))).first()
    if not wn:
        return df.where(F.lit(False))
    u = _unit_hash(id_col, seed)
    p = F.lit(float(fraction)) * F.col(weight_col).cast("double") \
        / (F.lit(wsum).cast("double") / F.lit(wn))
    return df.where(u < F.least(F.lit(1.0), p))


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 0,
                          num_partitions: int | None = None,
                          key_col: str = "shuffle_key") -> DataFrame:
    """Globally shuffle a corpus into a reproducible pseudo-random order
    — the last step before writing training shards, where sequential
    correlation in the source layout (crawl order, domain clustering)
    must not survive into the token stream.

    The order key is the content-hash uniform of ``id_col``: stable
    across runs, engines, and input layouts, and changing ``seed``
    yields an independent permutation.  The plan is a RANGE
    repartition on the key (Spark samples the key distribution to cut
    balanced ranges — no single-partition global sort) followed by a
    within-partition sort: reading partitions in index order yields
    the exact global order at any scale, which is how `orderBy`
    itself distributes, minus its extra pass when the output is
    written straight to sharded files.  Ties (hash collisions) break
    on ``id_col``, so the permutation is total and deterministic.
    """
    out = df.withColumn(key_col, _unit_hash(id_col, seed))
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (out.repartitionByRange(int(parts), F.col(key_col),
                                   F.col(id_col))
            .sortWithinPartitions(key_col, id_col))


def token_budget_per_group(df: DataFrame, id_col: str, group_col: str,
                           tokens_col: str, budget: int,
                           seed: int = 0) -> DataFrame:
    """Keep, per group, the prefix of rows — in deterministic
    content-hash order of ``id_col`` — whose CUMULATIVE ``tokens_col``
    stays within ``budget``: the token-budgeted sibling of
    :func:`cap_per_group` (training mixtures are budgeted in tokens,
    not documents; "2 B tokens of src3, 500 M of src9" is the contract
    a data order actually states).

    Semantics: rows are virtually ordered by (hash(seed, id), id)
    inside each group and a row survives iff its running token total ≤
    ``budget`` (so one over-sized document at the boundary is dropped
    and — cumulative sums being monotone — everything after it too:
    a strict prefix, reproducible on any layout; a document larger
    than the whole budget yields an empty group).

    Plan: one light aggregate computes per-group token totals (map-side
    combined, |groups| rows); groups already inside budget BYPASS the
    window entirely via a broadcast semi-join, so the window shuffle —
    the only per-row shuffle here — carries ONLY over-budget groups'
    rows.  In the common regime (few heavy sources over budget, a long
    tail under it) the expensive path touches a fraction of the corpus;
    the worst case degrades to exactly the single-window plan.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    totals = (df.groupBy(group_col)
              .agg(F.sum(tokens_col).alias("_grp_total")))
    over = totals.where(F.col("_grp_total") > budget) \
        .select(group_col)
    under_rows = df.join(F.broadcast(over), group_col, "left_anti")
    w = Window.partitionBy(group_col).orderBy(
        _unit_hash(id_col, seed).asc(), F.col(id_col).asc())
    over_rows = (df.join(F.broadcast(over), group_col, "left_semi")
                 .withColumn("_cum", F.sum(tokens_col).over(
                     w.rowsBetween(Window.unboundedPreceding,
                                   Window.currentRow)))
                 .where(F.col("_cum") <= budget).drop("_cum"))
    return under_rows.unionByName(over_rows)


def cap_per_group(df: DataFrame, id_col: str, group_col: str,
                  max_rows: int,
                  hot_threshold: int | None = None,
                  max_hot_groups: int = 100_000) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, chosen
    deterministically by the content-hash order of ``id_col`` (NOT by
    source order, which is layout-dependent) — the spam-domain quota
    cap: no single source/domain may contribute more than its cap to
    the training mix, and reruns keep the identical subset.

    Default plan: one window shuffle keyed on the group.  A
    pathologically hot group (a crawl dump where one domain is half the
    corpus) concentrates its rows in one window task, which must sort
    |group| rows to keep ``max_rows`` of them.

    ``hot_threshold`` turns on the skew-hardened two-phase plan:

    1. per-group counts (map-side-combined aggregate); groups with
       count > ``hot_threshold`` — at most N/hot_threshold of them,
       additionally bounded by ``max_hot_groups`` — come to the driver;
    2. hot groups get a codegen'd pre-filter ``u < 8·max_rows/size``:
       the kept set is exactly the ``max_rows`` hash-smallest rows, and
       those all survive any prefix-of-hash filter that keeps ≥
       ``max_rows`` rows — so the pre-filter is EXACT whenever enough
       rows survive, and the hot window task sorts ~8·max_rows rows
       instead of |group|;
    3. the survivor counts are VERIFIED (one aggregate): a hot group
       left short of ``min(max_rows, size)`` survivors (binomial tail,
       P < 1e-9 at the ×8 margin for max_rows ≥ 8) is recomputed
       exactly on its own rows and unioned back — the fallback keeps
       the operator exact, not probabilistic.

    The result is identical to the default plan for every group.
    """
    max_rows = int(max_rows)
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    u = _unit_hash(id_col, 0)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())

    def plain(d):
        return (d.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= max_rows)
                .drop("__rn"))

    if hot_threshold is None:
        return plain(df)
    hot_threshold = max(int(hot_threshold), max_rows)
    sizes = (df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") > hot_threshold))
    hot = {r[group_col]: r["__n"] for r in sizes.collect()}
    if len(hot) > max_hot_groups:
        raise ValueError(
            f"cap_per_group: {len(hot)} groups exceed "
            f"hot_threshold={hot_threshold} (> max_hot_groups="
            f"{max_hot_groups}); raise hot_threshold so the hot list "
            "stays driver-sized, or raise max_hot_groups if the "
            "driver really has the headroom.")
    if not hot:
        return plain(df)

    rate = None
    for g, n in hot.items():
        cond = F.col(group_col) == F.lit(g)
        f = min(1.0, 8.0 * max_rows / n)
        rate = (F.when(cond, F.lit(f)) if rate is None
                else rate.when(cond, F.lit(f)))
    rate = rate.otherwise(F.lit(1.0))
    pre = df.where(u < rate)
    capped = plain(pre)

    # verify: every hot group must keep min(max_rows, size) rows
    kept = {r[group_col]: r["__k"] for r in
            (capped.where(F.col(group_col).isin(list(hot)))
             .groupBy(group_col).agg(F.count(F.lit(1)).alias("__k"))
             .collect())}
    short = [g for g, n in hot.items()
             if kept.get(g, 0) < min(max_rows, n)]
    if short:
        # binomial-tail miss: recompute those groups exactly
        capped = (capped.where(~F.col(group_col).isin(short))
                  .unionByName(plain(
                      df.where(F.col(group_col).isin(short)))))
    return capped


def temperature_mix(df: DataFrame, id_col: str, strata_col: str,
                    alpha: float, seed: int = 0,
                    rate_col: str = "keep_rate") -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-sampling
    rule popularized by XLM-R/mT5): stratum *s* with nᵢ rows is kept at
    rate ∝ nₛ^(α−1), normalized so the largest rate is 1 (downsampling
    only — upsampling belongs to the explicit explode of
    ``mixture_resample``).  α = 1 keeps everything, α = 0 equalizes
    strata row counts, α between the two flattens a skewed source mix
    toward uniform; the resulting stratum SHARES follow nₛ^α / Σ nₜ^α
    over the strata whose rate did not clip at 1.

    Unlike ``stratified_sample`` the rates are computed FROM the data
    (per-stratum counts), so the operator adapts as the corpus grows.
    Plan: one map-side-combined count aggregate whose result — bounded
    by stratum cardinality, like every mixture spec in this module —
    comes to the driver and folds into a codegen'd when-chain filter;
    the data pass itself is a pure filter in the scan stage with zero
    joins and zero shuffles, identical in shape to ``hash_sample``.
    The kept set is the hash-smallest prefix per stratum, so raising α
    only shrinks each stratum's sample monotonically (subset-chain, the
    ``hash_sample`` property per stratum).

    Appends ``rate_col`` (the stratum's keep rate) so the mixture
    actually applied is visible in the output.
    """
    if not math.isfinite(alpha):
        raise ValueError(f"alpha must be finite, got {alpha}")
    counts = {r[0]: r[1]
              for r in df.groupBy(strata_col).count().collect()}
    if not counts:
        return df.withColumn(rate_col, F.lit(0.0)).where(F.lit(False))
    pw = {v: float(n) ** (alpha - 1.0) for v, n in counts.items()}
    top = max(pw.values())
    rates = {v: p / top for v, p in pw.items()}
    u = _unit_hash(id_col, seed)
    rate = None
    for v, r in rates.items():
        cond = F.col(strata_col) == F.lit(v)
        rate = (F.when(cond, F.lit(r)) if rate is None
                else rate.when(cond, F.lit(r)))
    return (df.withColumn(rate_col, rate)
            .where(u < F.col(rate_col)))


def quantile_buckets(df: DataFrame, value_col: str, n_buckets: int = 10,
                     id_col: str | None = None,
                     out_col: str = "bucket",
                     exact: bool = True) -> DataFrame:
    """Assign each row to a value-quantile bucket 0..n_buckets−1 (decile
    curriculum, length-stratified packing, difficulty tiers) — the
    scale-safe ``ntile``: a global ntile needs ONE total ordering (a
    single-partition window sort — the anti-pattern), while this
    computes the n_buckets−1 cutpoints in one aggregate and assigns
    with a codegen'd when-chain in the scan stage.

    ``exact=True`` (oracle configuration) uses the exact interpolated
    percentile; ``exact=False`` the t-digest sketch — same output
    shape, bounded memory at any scale.  Rows equal to a cutpoint go to
    the LOWER bucket (assignment is ``value <= cut``), so buckets are
    only approximately equal-sized under heavy ties — deterministic
    either way, which is what a curriculum needs.
    """
    n_buckets = int(n_buckets)
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    v = F.col(value_col).cast("double")
    fn = F.percentile if exact else (
        lambda c, q: F.percentile_approx(c, q))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(*[fn(v, F.lit(q)).alias(f"c{i}")
                    for i, q in enumerate(qs)]).first()
    if cuts[f"c{len(qs) - 1}"] is None:
        # empty input (or all-NULL values): percentile returns NULL —
        # every row (there may be none) goes to bucket 0, mirroring
        # numeric_histogram's degenerate-input convention
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    expr = None
    for i in range(len(qs)):
        cond = v <= F.lit(float(cuts[f"c{i}"]))
        expr = (F.when(cond, i) if expr is None
                else expr.when(cond, i))
    expr = (expr.otherwise(len(qs)) if expr is not None
            else F.lit(0))
    return df.withColumn(out_col, expr.cast("bigint"))


def upsample_by_weight(df: DataFrame, id_col: str, strata_col: str,
                       weights: dict, seed: int = 0,
                       default_weight: float = 1.0,
                       copy_col: str = "copy") -> DataFrame:
    """Fractional per-stratum UPsampling by explicit row repetition —
    the >1× counterpart of :func:`stratified_sample` (which rejects
    rates above 1; its docstring sends oversampling here so the
    duplication is visible in the plan).

    A stratum with weight ``w`` emits ``floor(w)`` copies of every row
    plus one more with probability ``frac(w)``, decided by the same
    deterministic ``(seed, id)`` unit hash every sampler here uses — a
    row's copy count never changes under growth or repartitioning, and
    E[copies] = w exactly.  Each copy is tagged ``copy_col`` ∈
    [0, n_copies) so downstream keys stay unique (epoch-style training
    repetition, DoReMi-style domain reweighting).

    Scale: one narrow ``explode(sequence(...))`` — no shuffle, no
    driver state; output rows = Σ w(stratum)·|stratum|.  Weights < 1
    downsample by the identical rule (n_copies ∈ {0, 1}), so a single
    mixture spec can express both directions.
    """
    for v, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for stratum {v!r} must be >= 0, "
                             f"got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, "
                         f"got {default_weight}")
    w = None
    for v, wt in weights.items():
        cond = F.col(strata_col) == F.lit(v)
        w = (F.when(cond, F.lit(float(wt))) if w is None
             else w.when(cond, F.lit(float(wt))))
    w = F.lit(float(default_weight)) if w is None \
        else w.otherwise(F.lit(float(default_weight)))
    u = _unit_hash(id_col, seed)
    n = F.floor(w).cast("bigint") + (u < (w - F.floor(w))).cast("bigint")
    out = df.withColumn("__n_copies", n)
    out = (out.where(F.col("__n_copies") > 0)
           .withColumn(copy_col,
                       F.explode(F.expr("sequence(0, __n_copies - 1)")))
           .drop("__n_copies"))
    return out


def leakage_safe_split(df: DataFrame, id_col: str, key,
                       weights: dict[str, float], seed: int = 0,
                       out_col: str = "split") -> DataFrame:
    """Train/val/test split that can NEVER leak near-identical rows
    across splits: the hash is taken over a content GROUP KEY (e.g.
    ``text.md5_fingerprint`` or the winnowing-lite
    ``min_shingle_fingerprint``) instead of the row id, so every
    member of a duplicate/near-dup group lands in the SAME split.

    A plain id-keyed :func:`split_by_hash` followed by (or preceded
    by) dedup still leaks when near-dups straddle the split boundary —
    the classic eval-contamination bug this operator closes at the
    split itself.  ``key`` is any deterministic Column over the row
    (no shuffle: the label is a map-side pure function of content).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: "
                         f"{weights}")
    total = float(sum(weights.values()))
    h = (f"CAST(conv(substring(md5(concat('{seed}', ':', __lsk)), "
         f"1, 12), 16, 10) AS BIGINT)")
    tagged = df.withColumn("__lsk", key.cast("string"))
    u = F.expr(h) / F.lit(float(_HASH_SPACE))
    names = list(weights)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return tagged.withColumn(out_col, expr).drop("__lsk")


def weighted_sample_topk(df: DataFrame, id_col: str, weight_col: str,
                         k: int, group_col: str | None = None,
                         seed: int = 0) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — exactly
    ``k`` rows (fewer if the population is smaller), inclusion odds
    proportional to weight, via the Efraimidis–Spiridis exponential-
    key trick: rank on ``key = ln(u) / w`` (equivalent ordering to
    ``u^(1/w)``) with the usual deterministic ``(seed, id)`` unit
    hash for ``u``.  :func:`importance_sample` keeps an EXPECTED
    weighted fraction; this keeps an exact count — the "give me the
    best 10 k docs, length-weighted" shape.  Rows with weight ≤ 0 are
    never selected.

    Scale: grouped form is one window over the group shuffle;
    ungrouped form compiles to TakeOrderedAndProject (per-partition
    top-k, driver merge of k·partitions rows) — no global sort, no
    single-reducer funnel.  Ties (astronomically unlikely with a
    48-bit u) break by id for engine-reproducible output.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # floor u at 2^-49: the 48-bit unit hash is exactly 0 with
    # p ≈ 2^-48 per row, and engines disagree on ln(0) — Spark's LOG
    # returns NULL (the row silently sorts by NULL-ordering rules
    # instead of ES semantics), DuckDB raises.  The floor only moves
    # the measure-zero u = 0 case.
    u = F.greatest(_unit_hash(id_col, seed), F.lit(2.0 ** -49))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    base = df.where(w > 0).withColumn("__wsk", key)
    if group_col is None:
        out = base.orderBy(F.col("__wsk").desc(), F.col(id_col)).limit(k)
        return out.drop("__wsk")
    win = Window.partitionBy(group_col).orderBy(F.col("__wsk").desc(),
                                                F.col(id_col))
    return (base.withColumn("__wsr", F.row_number().over(win))
            .where(F.col("__wsr") <= k).drop("__wsk", "__wsr"))
