"""Deduplication operators for large-scale training-data pipelines.

All variants are declarative DataFrame plans (no Python UDFs), designed so
the expensive parts are map-side combinable aggregations and key-bucketed
joins — the shapes that survive a 100 TB corpus:

* **exact**: hash-groupBy on the normalized-text MD5 — one shuffle on the
  fingerprint, map-side partial aggregation for the group sizes.
* **MinHash + LSH**: shingle → k minhashes (explode + min-agg, map-side
  combinable) → band keys → bucket self-join (candidates only) → exact
  Jaccard verification on the candidate set.  No O(n²) stage anywhere.
* **SimHash**: 60-bit fingerprint as a single narrow expression
  (operators.text.simhash60) → 4×15-bit band bucket join → Hamming ≤ t
  verify via xor/bit_count.
* **embedding cosine**: see operators.similarity (hyperplane-LSH buckets).

Each has an exact DuckDB twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import HASH_BASE, HASH_PRIME, md5_fingerprint, simhash_table

#: (a_i, b_i) coefficients for the k minhash permutations h'(x) = (a·x+b) % p
MINHASH_K = 8
MINHASH_SEED = 7

#: default document-frequency cutoff for posting-list (exact-Jaccard /
#: containment) candidate joins.  The self-join fanout is Σ df(s)² over
#: shingles — on a real web corpus a boilerplate 3-gram appears in
#: millions of documents and an UNBOUNDED posting list generates ~10¹²
#: candidate pairs from that one shingle.  The scale-safe behavior is
#: therefore the DEFAULT (the ``max_bucket`` band-join precedent);
#: exact-semantics oracle comparison opts OUT explicitly with
#: ``max_df=None``.
#:
#: ENGINE-WIDE ``max_df`` CONVENTION (round 8): operators whose
#: posting join has MULTIPLICATIVE df fanout (self-joins Σ df², or
#: corpus×corpus Σ df_a·df_b) default to this finite cutoff — an
#: unbounded hot posting is a quadratic blow-up there.  Operators
#: whose fanout is ADDITIVE in df because one side is contract-bounded
#: (``text.bm25_topk``: Σ df(t) over a small query set;
#: ``fuzzy_join``/``fuzzy_decontaminate``: the test/query corpus)
#: default to ``max_df=None`` — pruning is a quality/perf knob there,
#: not a safety requirement, so exactness stays the default.  When a
#: default cutoff IS active, the first use emits a one-time warning so
#: silently-pruned results are impossible; audit the actual impact
#: with :func:`posting_prune_report`.
DEFAULT_MAX_DF = 1000

#: sentinel distinguishing "caller left max_df at its default" (warn
#: once that pruning is active) from an explicit max_df=DEFAULT_MAX_DF
#: opt-in (never warn)
_MAX_DF_UNSET = object()

_warned_default_prune = False


def _note_default_prune(fn_name: str) -> None:
    """One-time process-wide warning that a DEFAULT df cutoff is
    pruning candidate postings (callers who pass ``max_df`` explicitly
    — any value — have opted in and are not warned)."""
    global _warned_default_prune
    if not _warned_default_prune:
        _warned_default_prune = True
        import warnings
        warnings.warn(
            f"{fn_name}: using the default posting-list cutoff "
            f"max_df={DEFAULT_MAX_DF}; documents paired ONLY by "
            "shingles more frequent than that are not reported. "
            "Pass max_df=None for exact semantics, or run "
            "posting_prune_report() to measure what the cutoff drops.",
            stacklevel=3)


def posting_prune_report(df: DataFrame, text_col: str, id_col: str,
                         n: int = 3,
                         max_df: int = DEFAULT_MAX_DF) -> DataFrame:
    """Measure what a posting-list df cutoff would drop on THIS corpus:
    one row — ``n_shingles`` (distinct), ``n_pruned_shingles`` (df >
    ``max_df``), ``n_postings_dropped`` (rows leaving the join input),
    ``max_observed_df``.

    The candidate joins cannot report this themselves without an extra
    job per call, so the audit is a separate, explicitly-run operator
    (one explode + one map-side-combined groupBy — linear scan scale).
    """
    sh = word_shingles(df, text_col, id_col, n)
    dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s"))
    pruned = F.col("df_s") > max_df
    return dfs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(pruned.cast("bigint")).cast("bigint")
        .alias("n_pruned_shingles"),
        F.sum(F.when(pruned, F.col("df_s")).otherwise(F.lit(0)))
        .cast("bigint").alias("n_postings_dropped"),
        F.max("df_s").cast("bigint").alias("max_observed_df"))

#: java.util.regex metacharacters: a separator containing none of these
#: is passed to ``F.split`` verbatim, keeping Spark's non-regex
#: literal-split fast path (quoting "\n" as \Q\n\E measured 2.1× slower
#: at sf0.1 — round-7 verdict)
_RX_SPECIAL = re.compile(r"[\\.\[\]{}()*+?^$|]")


def minhash_coefficients(k: int = MINHASH_K, seed: int = MINHASH_SEED):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, HASH_PRIME, size=k).astype(np.int64)
    b = rng.randint(0, HASH_PRIME, size=k).astype(np.int64)
    return list(map(int, a)), list(map(int, b))


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: (fingerprint, keeper id, group size)."""
    return (df.select(md5_fingerprint(text_col).alias("fp"), F.col(id_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_copies")))


def normalized_key(col: str) -> "F.Column":
    """The fuzzy-exact dedup key: casefold → strip everything but
    ``[a-z0-9]`` and whitespace → collapse whitespace → trim — the
    normalization under which C4/RefinedWeb-style pipelines run their
    "exact" pass (catches case/punctuation/whitespace reflows that the
    raw-md5 key misses while staying one narrow JVM expression, unlike
    a real near-dup pass).  Deliberately ASCII-alnum: the key is a
    GROUPING fingerprint, not a display form, and the aggressive strip
    is what makes reflowed copies collide."""
    c = F.lower(F.col(col))
    c = F.regexp_replace(c, "[^a-z0-9\\s]+", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def normalized_fingerprint(col: str) -> "F.Column":
    """md5 of :func:`normalized_key` — the shuffle key for
    :func:`dedup_exact_normalized` (text never keys an exchange)."""
    return F.md5(normalized_key(col))


def dedup_exact_normalized(df: DataFrame, text_col: str,
                           id_col: str) -> DataFrame:
    """Exact-after-normalization duplicate groups:
    ``(fp, keeper, n_copies)`` over :func:`normalized_fingerprint` —
    same shape and scale behavior as :func:`dedup_exact` (one
    map-side-combinable groupBy on a 32-hex key), catching the
    case/punctuation/whitespace variants raw-exact misses."""
    return (df.select(normalized_fingerprint(text_col).alias("fp"),
                      F.col(id_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_copies")))


def dedup_exact_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The deduplicated table itself: keep the min-id row per fingerprint.
    One shuffle on the fingerprint; survives any scale."""
    from pyspark.sql import Window
    w = Window.partitionBy(md5_fingerprint(text_col)).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def dedup_keep_best(df: DataFrame, text_col: str, id_col: str,
                    score=None, key=None) -> DataFrame:
    """Dedup keeping the BEST row per duplicate group — argmax
    ``score`` (default: the composite :func:`~.text.quality_score`),
    ties → lowest id — instead of keep-first.

    Keep-first is the right default for *identical* text, but pipelines
    dedup on a fingerprint coarser than the raw bytes (``key``, default
    the exact normalized-text MD5; pass
    :func:`~.text.min_shingle_fingerprint` for winnowing-style near-dup
    groups) while rows still differ in metadata and content quality —
    then the kept copy should be the best one, not the lowest-id one
    (the C4/RefinedWeb "canonical document selection" step).

    Same physical shape as :func:`dedup_exact_keep_first`: ONE shuffle
    on the group key, a row_number window ordered (score DESC, id ASC),
    hot keys bounded by duplicate-group size.
    """
    from pyspark.sql import Window

    from .text import quality_score

    if score is None:
        score = quality_score(text_col)
    if key is None:
        key = md5_fingerprint(text_col)
    w = Window.partitionBy(key) \
        .orderBy(F.col("_score").desc(), F.col(id_col))
    return (df.withColumn("_score", score)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", "_score"))


def curate(df: DataFrame, text_col: str, id_col: str,
           min_quality: float = 0.5, lang: str | None = "en") -> DataFrame:
    """The canonical curation pipeline: exact-dedup (keep lowest id) →
    quality gate → optional language filter.  Pure narrow expressions +
    one fingerprint shuffle — the shape of a first-pass corpus clean at
    any scale.  Returns the surviving rows of ``df``.
    """
    from .text import lang_id, quality_score

    kept = dedup_exact_keep_first(df, text_col, id_col)
    kept = kept.where(quality_score(text_col) >= min_quality)
    if lang is not None:
        kept = kept.where(lang_id(text_col) == lang)
    return kept


def word_shingles(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3, distinct: bool = True) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    ``distinct=False`` skips the dedup shuffle (which is keyed by the
    shingle TEXT) — for consumers whose downstream aggregate is already
    idempotent per (id, shingle), e.g. the Bloom probe.

    The explode is linear in corpus token count; the downstream min-agg is
    map-side combinable, so this is the scalable MinHash front end.

    Tokenization is materialized into its own projection first: inlining
    the split/filter into the shingle lambda makes Spark re-tokenize the
    document at every shingle position (O(tokens²) — measured 15.9 s for
    5 k docs) because the alias is substituted into the lambda body.  A
    multi-use, non-cheap alias blocks CollapseProject, so ``t`` is
    computed once per document.
    """
    from ..plans.exchange import ensure_min_parallelism

    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    tdf = (ensure_min_parallelism(df)
           .select(F.col(id_col).alias("id"), F.expr(toks).alias("t")))
    # NB: Spark sequence(1, 0) yields a DESCENDING [1, 0] — guard short
    # docs explicitly instead of relying on greatest()
    body = (f"transform(sequence(1, size(t) - {n - 1}), "
            f"i -> concat_ws(' ', "
            + ", ".join(f"element_at(t, i + {j})" for j in range(n))
            + "))")
    shingles = f"CASE WHEN size(t) < {n} THEN array() ELSE {body} END"
    out = tdf.select("id", F.explode(F.expr(shingles)).alias("shingle"))
    return out.distinct() if distinct else out


def _shingle_hash_expr(col: str) -> str:
    """Shingle → BIGINT hash: first 12 hex nibbles of md5, mod 2³¹−1.

    md5 + conv are JVM-native codegen'd expressions — the earlier
    per-character polynomial fold ran one interpreted lambda call per
    character per shingle (~5M calls at sf0.1).  The DuckDB twin folds
    the same 12 nibbles (__spark_entry__._duck_md5hash12).
    """
    return (f"CAST(conv(substring(md5({col}), 1, 12), 16, 10) AS BIGINT) "
            f"% {HASH_PRIME}")


def minhash_signatures_from_shingles(sh: DataFrame, k: int = MINHASH_K,
                                     seed: int = MINHASH_SEED) -> DataFrame:
    """(id, mh_0 … mh_{k-1}) from a (id, shingle) relation."""
    a, b = minhash_coefficients(k, seed)
    h = sh.select("id", F.expr(_shingle_hash_expr("shingle")).alias("h"))
    aggs = [F.min(((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % HASH_PRIME))
            .alias(f"mh_{i}") for i in range(k)]
    return h.groupBy("id").agg(*aggs)


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       k: int = MINHASH_K, n: int = 3,
                       seed: int = MINHASH_SEED) -> DataFrame:
    """(id, mh_0 … mh_{k-1}) MinHash signature per document.

    Documents with no shingles (fewer than n tokens) are dropped —
    they cannot be near-duplicates under this scheme.
    """
    return minhash_signatures_from_shingles(
        word_shingles(df, text_col, id_col, n), k, seed)


def band_self_join_pairs(banded: DataFrame, key_cols=("band_key",),
                         id_col: str = "id",
                         max_bucket: int | None = None) -> DataFrame:
    """Candidate (id_a, id_b) pairs from a banded relation — the shared
    skew-hardened core of every LSH band join (minhash, simhash,
    hyperplane).

    ``max_bucket=None``: plain bucket self-join — ALL pairs sharing a
    band key.  Exact (the oracle configuration), but a bucket of B rows
    emits B²/2 pairs from ONE join task.  AQE's skew-join split cannot
    save this: skew detection is input-bytes-based, and a hot bucket is
    a few KB of *input* with quadratic *output* fanout (measured: a
    400-row bucket → 80 k joined rows with `skew=true` never planned).

    ``max_bucket=N``: buckets with ≤ N members emit all pairs; larger
    (hot) buckets emit **star pairs** — every member paired with the
    bucket's min-id hub — O(B) rows instead of O(B²).  Within a bucket
    every member then shares a verified pair with the hub, so
    *duplicate-cluster connectivity* (what dedup consumers actually
    union-find over) is preserved; only hub-less member↔member edges
    inside hot buckets are dropped.  Hot buckets at corpus scale are
    overwhelmingly exact-duplicate/boilerplate clusters, where the hub
    edge carries the same information.  Bucket stats come from a window
    over the SAME shuffle key as the join (O(B log B) per bucket, no
    quadratic stage anywhere).
    """
    from pyspark.sql import Window

    key_cols = list(key_cols)
    jid = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]

    def all_pairs(rel):
        a, b = rel.alias("a"), rel.alias("b")
        cond = jid[0]
        for c in jid[1:]:
            cond = cond & c
        return (a.join(b, cond & (F.col(f"a.{id_col}")
                                  < F.col(f"b.{id_col}")))
                .select(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b")))

    if max_bucket is None:
        return all_pairs(banded).distinct()

    w = Window.partitionBy(*key_cols)
    bb = (banded.withColumn("__n_b", F.count(F.lit(1)).over(w))
          .withColumn("__hub", F.min(id_col).over(w)))
    cold = bb.where(F.col("__n_b") <= max_bucket).select(id_col, *key_cols)
    hot = (bb.where((F.col("__n_b") > max_bucket)
                    & (F.col(id_col) != F.col("__hub")))
           .select(F.col("__hub").alias("id_a"),
                   F.col(id_col).alias("id_b")))
    return all_pairs(cold).unionByName(hot).distinct()


def minhash_band_keys(sigs: DataFrame, k: int = MINHASH_K,
                      rows_per_band: int = 2) -> DataFrame:
    """(id, band_key) LSH banding of a signature relation — bands
    derive from the signatures alone, so a PERSISTED signature table is
    a complete near-dup index (no text retained)."""
    n_bands = k // rows_per_band
    # one explode, not an n_bands-way union: a union re-evaluates the
    # signature aggregation once per band unless exchange reuse kicks in
    keys = [F.concat_ws(":", F.lit(str(bnd)),
                        *[F.col(f"mh_{bnd * rows_per_band + r}")
                          for r in range(rows_per_band)])
            for bnd in range(n_bands)]
    return sigs.select("id", F.explode(F.array(*keys)).alias("band_key"))


def minhash_band_pairs(sigs: DataFrame, k: int = MINHASH_K,
                       rows_per_band: int = 2,
                       max_bucket: int | None = None) -> DataFrame:
    """Candidate pairs sharing at least one LSH band: (id_a, id_b).
    ``max_bucket`` bounds hot-bucket fanout (see band_self_join_pairs)."""
    banded = minhash_band_keys(sigs, k, rows_per_band)
    return band_self_join_pairs(banded, max_bucket=max_bucket)


def lsh_collision_probability(s: float, bands: int,
                              rows_per_band: int) -> float:
    """P(candidate | Jaccard = s) for (b, r) MinHash-LSH banding:
    ``1 − (1 − s^r)^b`` — the S-curve every banding trades along
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4)."""
    return 1.0 - (1.0 - s ** rows_per_band) ** bands


def lsh_plan(threshold: float, k_max: int = 64,
             fp_weight: float = 0.5, fn_weight: float = 0.5,
             steps: int = 500) -> dict:
    """Auto-tune the MinHash-LSH banding for a target Jaccard
    ``threshold``: pick (k, bands, rows_per_band) with b·r = k ≤
    ``k_max`` minimizing ``fp_weight·FP + fn_weight·FN`` where FP =
    ∫₀ᵗ P(s) ds (below-threshold pairs that become candidates — wasted
    verify work) and FN = ∫ₜ¹ (1 − P(s)) ds (true pairs LSH misses —
    lost recall), P the banding S-curve — the datasketch
    ``_optimal_param`` method (public).  Deterministic trapezoid
    integration; ties prefer fewer hashes (cheaper signatures), then
    more rows per band (sharper curve).

    At 100 TB this knob IS the cost model: k sets signature storage
    and b the index fanout (each doc posts b band keys), while FP
    multiplies the exact-verify join's row count.  Raise ``fp_weight``
    when verification dominates (long docs), ``fn_weight`` when recall
    is contractual (decontamination).  Returns ``{k, bands,
    rows_per_band, fp, fn, s50}`` — ``s50`` the curve midpoint
    ``(1/b)^(1/r)``, which lands near ``threshold`` by construction.
    Feed the result to :func:`minhash_signatures` (k) and
    :func:`minhash_band_pairs` (k, rows_per_band).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if k_max < 2:
        raise ValueError(f"k_max must be >= 2, got {k_max}")

    def _err(b, r):
        n_lo = max(2, int(steps * threshold))
        n_hi = max(2, int(steps * (1.0 - threshold)))
        fp = fn = 0.0
        for i in range(n_lo):          # trapezoid over [0, t]
            s0 = threshold * i / n_lo
            s1 = threshold * (i + 1) / n_lo
            fp += (lsh_collision_probability(s0, b, r)
                   + lsh_collision_probability(s1, b, r)) / 2 \
                * (s1 - s0)
        for i in range(n_hi):          # trapezoid over [t, 1]
            s0 = threshold + (1.0 - threshold) * i / n_hi
            s1 = threshold + (1.0 - threshold) * (i + 1) / n_hi
            fn += (2.0 - lsh_collision_probability(s0, b, r)
                   - lsh_collision_probability(s1, b, r)) / 2 \
                * (s1 - s0)
        return fp, fn

    best = None
    for k in range(2, k_max + 1):
        for r in range(1, k + 1):
            if k % r:
                continue
            b = k // r
            fp, fn = _err(b, r)
            key = (fp_weight * fp + fn_weight * fn, k, -r)
            if best is None or key < best[0]:
                best = (key, k, b, r, fp, fn)
    _key, k, b, r, fp, fn = best
    return {"k": k, "bands": b, "rows_per_band": r,
            "fp": round(fp, 6), "fn": round(fn, 6),
            "s50": round((1.0 / b) ** (1.0 / r), 6)}


def jaccard_verify(pairs: DataFrame, shingles: DataFrame,
                   threshold: float = 0.5,
                   max_candidates: int | None = None) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs:
    (id_a, id_b, jaccard) with jaccard ≥ threshold.

    The verify join fans out to Σ(|sh_a| + |sh_b|) rows over the
    candidate pairs, so an unbounded candidate set (band join run with
    ``max_bucket=None`` on a duplicate-heavy corpus) explodes *here*,
    one stage after the bucket join that caused it.  ``max_candidates``
    enforces the bound the way ``near_dup_pairs`` enforces its
    broadcast bound: the candidate relation is checkpointed (so the
    count is not recomputed by the join), counted — ONE cheap scalar
    job — and an over-bound count raises with the knobs that fix it
    (``max_bucket`` star-pairing, ``max_df`` posting pruning) instead
    of spilling mid-join.  ``None`` (the oracle configuration) adds no
    extra job and leaves the plan byte-identical.
    """
    if max_candidates is not None:
        pairs = pairs.localCheckpoint(eager=True)
        n_cand = pairs.count()
        if n_cand > max_candidates:
            raise ValueError(
                f"jaccard_verify: {n_cand} candidate pairs > "
                f"max_candidates={max_candidates}; the exact-Jaccard "
                "verify join fans out per shingle per pair and would "
                "explode. Bound candidate generation with max_bucket "
                "(star-pairs hot LSH buckets) or max_df (prunes "
                "stop-shingle postings), or raise max_candidates if "
                "the cluster really has the headroom.")
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col("id").alias("id_a"),
                         F.col("shingle").alias("sh_a"))
    sb = shingles.select(F.col("id").alias("id_b"),
                         F.col("shingle").alias("sh_b"))
    inter = (pairs.join(sa, "id_a").join(sb, "id_b")
        .where(F.col("sh_a") == F.col("sh_b"))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_near_dups(df: DataFrame, text_col: str, id_col: str,
                      threshold: float = 0.5, k: int = MINHASH_K,
                      n: int = 3, max_bucket: int | None = None,
                      max_candidates: int | None = None) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs with exact verification:
    (id_a, id_b, jaccard ≥ threshold).

    The shingle relation feeds the signature step AND the verification
    joins; without materialization the expensive explode/hash chain
    re-executes once per downstream join.  ``localCheckpoint`` stores the
    computed blocks on the executors and truncates the lineage, and its
    storage is released with the plan — no unpersist bookkeeping, no
    driver collection, scale-safe.  Eager: the downstream consumers are
    *independent sibling stages* that the DAG scheduler submits
    concurrently — a lazy checkpoint would be computed once per sibling
    (measured 3× tokenization cost) because none sees the others' cache
    in flight.

    ``max_bucket`` is the scale knob for duplicate-heavy corpora: hot
    band buckets emit star pairs instead of all pairs (see
    band_self_join_pairs); ``None`` keeps exact all-pairs semantics.
    """
    sh = word_shingles(df, text_col, id_col, n).localCheckpoint(eager=True)
    sigs = minhash_signatures_from_shingles(sh, k)
    pairs = minhash_band_pairs(sigs, k, max_bucket=max_bucket)
    return jaccard_verify(pairs, sh, threshold,
                          max_candidates=max_candidates)


def ngram_jaccard_near_dups(df: DataFrame, text_col: str, id_col: str,
                            threshold: float = 0.8, n: int = 3,
                            max_df: int | None = _MAX_DF_UNSET,
                            shingles: DataFrame | None = None
                            ) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via a shingle inverted
    index (no MinHash approximation in candidate generation):
    (id_a, id_b, jaccard ≥ threshold).

    Candidates = document pairs sharing ≥ 1 shingle, found by the
    posting-list self-join on ``shingle`` — a hash-partitioned shuffle
    join whose fanout is Σ df(s)² over shingles.  At corpus scale that
    sum is dominated by stop-shingles, so ``max_df`` prunes postings
    longer than the cutoff before the join (standard inverted-index
    practice; pairs sharing *only* ultra-common shingles can't clear a
    high Jaccard threshold anyway — with threshold t and document
    shingle-set size m, a true near-dup shares ≥ t·m/(1+t) shingles,
    overwhelmingly including rare ones).  The finite
    :data:`DEFAULT_MAX_DF` is the DEFAULT — unbounded postings on a
    web corpus are a quadratic blow-up on the hottest boilerplate
    shingle; pass ``max_df=None`` explicitly to opt into exact
    semantics for oracle comparison.
    """
    if max_df is _MAX_DF_UNSET:
        max_df = DEFAULT_MAX_DF
        _note_default_prune("ngram_jaccard_near_dups")
    # shingles: a pre-materialized word_shingles(df, text_col, id_col,
    # n) relation — callers that also need the shingles elsewhere
    # (lsh_recall_audit pairs this ranker with a MinHash leg) pass it
    # so the corpus is tokenized once, not once per leg
    # (optimization r12, the doc_term_counts sharing idiom)
    sh = (word_shingles(df, text_col, id_col, n)
          .localCheckpoint(eager=True)
          if shingles is None else shingles)
    posting = sh
    if max_df is not None:
        rare = (sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df_s"))
                .where(F.col("df_s") <= max_df).select("shingle"))
        posting = sh.join(rare, "shingle")
    a = posting.select(F.col("id").alias("id_a"),
                       F.col("shingle").alias("s"))
    b = posting.select(F.col("id").alias("id_b"),
                       F.col("shingle").alias("s"))
    inter = (a.join(b, "s")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def simhash_near_dups(df: DataFrame, text_col: str, id_col: str,
                      max_hamming: int = 3,
                      max_bucket: int | None = None) -> DataFrame:
    """SimHash near-duplicate pairs over the 60-bit fingerprint
    (operators.text.simhash60): band candidates (any of the four 15-bit
    bands equal ⇒ candidate — guarantees recall for Hamming ≤ 3 by
    pigeonhole over 4 bands) verified with bit_count(xor) ≤ max_hamming.
    Each band key lives in a 2¹⁵ bucket space, so expected bucket
    occupancy stays tiny as the corpus grows — EXCEPT for true duplicate
    clusters, which share whole fingerprints and pile into one bucket
    regardless of the band space.  ``max_bucket`` bounds that (star
    pairs for hot buckets, carrying the hub's fingerprint through the
    same window so the Hamming verify needs no extra join); ``None``
    keeps exact all-pairs semantics (the oracle configuration)."""
    from pyspark.sql import Window

    from ..plans.exchange import ensure_min_parallelism

    sh = simhash_table(ensure_min_parallelism(df), text_col, id_col) \
        .localCheckpoint(eager=True)
    keys = [F.concat_ws(":", F.lit(str(b)),
                        F.shiftright(F.col("sh"), 15 * b) % 32768)
            for b in range(4)]
    banded = sh.select("id", "sh",
                       F.explode(F.array(*keys)).alias("band_key"))

    def all_pairs(rel):
        a, b = rel.alias("a"), rel.alias("b")
        return (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                       & (F.col("a.id") < F.col("b.id")))
                .select(F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"),
                        F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                        .alias("hamming")))

    if max_bucket is None:
        pairs = all_pairs(banded)
    else:
        w = Window.partitionBy("band_key")
        wo = w.orderBy("id")
        bb = (banded.withColumn("__n_b", F.count(F.lit(1)).over(w))
              .withColumn("__hub", F.min("id").over(w))
              .withColumn("__hub_sh", F.first("sh").over(wo)))
        cold = bb.where(F.col("__n_b") <= max_bucket) \
            .select("id", "sh", "band_key")
        hot = (bb.where((F.col("__n_b") > max_bucket)
                        & (F.col("id") != F.col("__hub")))
               .select(F.col("__hub").alias("id_a"),
                       F.col("id").alias("id_b"),
                       F.bit_count(F.col("__hub_sh").bitwiseXOR(F.col("sh")))
                       .alias("hamming")))
        pairs = all_pairs(cold).unionByName(hot)
    return pairs.distinct().where(F.col("hamming") <= max_hamming)


def dedup_clusters(df: DataFrame, text_col: str, id_col: str,
                   threshold: float = 0.5, k: int = MINHASH_K,
                   n: int = 3, max_bucket: int | None = None) -> DataFrame:
    """Near-duplicate CLUSTERS: (id, component) for every document that
    has at least one verified near-duplicate; ``component`` is the
    min-id representative of its duplicate group.

    This is the consumer-facing form of minhash_near_dups — dedup
    decisions need clusters, not pairs.  Pairs feed
    operators.graph.connected_components (min-label propagation,
    O(cluster diameter) rounds ≈ 2 for duplicate cliques/stars).
    """
    from .graph import connected_components

    pairs = minhash_near_dups(df, text_col, id_col, threshold, k, n,
                              max_bucket=max_bucket)
    return connected_components(pairs)


def fuzzy_dedup_keep_first(df: DataFrame, text_col: str, id_col: str,
                           threshold: float = 0.5, k: int = MINHASH_K,
                           n: int = 3,
                           max_bucket: int | None = None) -> DataFrame:
    """The fuzzily-deduplicated corpus itself: drop every row whose id
    belongs to a near-duplicate component but is not its min-id
    representative.  Rows with no near-duplicate survive untouched.

    One anti-join against the (small relative to the corpus) loser set —
    broadcastable when duplicate density is low, plain shuffled
    hash join otherwise; either way no O(n²) stage.
    """
    comp = dedup_clusters(df, text_col, id_col, threshold, k, n,
                          max_bucket=max_bucket)
    losers = (comp.where(F.col("id") != F.col("component"))
              .select(F.col("id").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


def fuzzy_dedup_keep_best(df: DataFrame, text_col: str, id_col: str,
                          threshold: float = 0.5, k: int = MINHASH_K,
                          n: int = 3, score=None,
                          max_bucket: int | None = None) -> DataFrame:
    """:func:`fuzzy_dedup_keep_first` with keep-BEST selection: within
    each near-duplicate connected component keep the argmax-``score``
    row (default :func:`~.text.quality_score`; ties → lowest id), not
    the min-id one — near-dup canonical selection where copies differ
    in quality (truncated mirrors, boilerplate-wrapped scrapes).

    Plan: the component relation (id, component) joins back to the
    corpus only for component MEMBERS (small relative to the corpus),
    a window picks each component's winner, and one anti-join drops the
    losers — no O(n²) stage, window partitions bounded by component
    size."""
    from pyspark.sql import Window

    from .text import quality_score

    if score is None:
        score = quality_score(text_col)
    comp = dedup_clusters(df, text_col, id_col, threshold, k, n,
                          max_bucket=max_bucket)
    members = df.select(F.col(id_col).alias("id"),
                        score.alias("_score")) \
        .join(comp, "id")
    w = Window.partitionBy("component").orderBy(
        F.col("_score").desc(), F.col("id"))
    losers = (members.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") > 1)
              .select(F.col("id").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


def cross_overlap_pairs(corpus_a: DataFrame, corpus_b: DataFrame,
                        text_col: str, id_col: str, n: int = 8,
                        min_shared: int = 1,
                        max_df: int | None = None) -> DataFrame:
    """Cross-corpus n-gram overlap: (id_a, id_b, n_shared) for every
    pair sharing ≥ ``min_shared`` distinct word n-grams across the two
    corpora — the candidate stage of test-set decontamination.

    Inverted-index join on the shingle (hash-partitioned equi-join,
    fanout Σ df_a(s)·df_b(s)); ``max_df`` prunes stop-shingles on BOTH
    posting lists before the join (same control as
    ngram_jaccard_near_dups).  Counts are map-side combinable.
    """
    sha = word_shingles(corpus_a, text_col, id_col, n)
    shb = word_shingles(corpus_b, text_col, id_col, n)
    if max_df is not None:
        both = sha.select("shingle").unionAll(shb.select("shingle"))
        rare = (both.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df_s"))
                .where(F.col("df_s") <= max_df).select("shingle"))
        sha = sha.join(rare, "shingle")
        shb = shb.join(rare, "shingle")
    a = sha.select(F.col("id").alias("id_a"), "shingle")
    b = shb.select(F.col("id").alias("id_b"), "shingle")
    return (a.join(b, "shingle")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def decontaminate(train_df: DataFrame, test_df: DataFrame,
                  text_col: str, id_col: str, n: int = 8,
                  min_shared: int = 1,
                  max_df: int | None = None) -> DataFrame:
    """Drop every training document that shares ≥ ``min_shared`` word
    n-grams with ANY test document — the standard n-gram
    decontamination rule (GPT-3 used 13-grams; pick ``n`` ≥ the longest
    span you consider memorizable).  Returns the surviving train rows.

    One inverted-index join + one anti-join; the contaminated-id set is
    far smaller than the corpus, so the anti-join broadcasts at scale.
    """
    pairs = cross_overlap_pairs(train_df, test_df, text_col, id_col, n,
                                min_shared, max_df)
    contaminated = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return train_df.join(contaminated, id_col, "left_anti")


def decontaminate_spans(train_df: DataFrame, test_df: DataFrame,
                        text_col: str, id_col: str, n: int = 5
                        ) -> DataFrame:
    """SPAN-level decontamination: excise every token span that matches
    a test-set word n-gram and keep the rest of the document —
    :func:`decontaminate` drops whole documents, which at a large
    ``n``-gram overlap rate throws away far more tokens than actually
    leaked; this is the excision variant (the C4/"copyright removal"
    shape applied to eval leakage).

    A train token position is contaminated iff ANY test n-gram matches
    an n-gram window covering it; the document is re-emitted from the
    surviving tokens (single-space joined — whitespace is normalized,
    the same convention as :func:`dedup_spans`), plus an ``n_removed``
    token count.  Documents with < ``n`` tokens cannot be contaminated,
    matching the document-level rule.

    Scale shape: the test side collects once into the bounded 48-bit
    hash array of :func:`~..streaming.decontam.eval_ngram_hashes` and
    BROADCASTS; each train doc carries a codegen'd shingle-hash array
    (no explode, no text-keyed shuffle), and one Arrow kernel per batch
    does a single vectorized ``np.isin`` over the flattened hashes —
    the train corpus never shuffles at all (a pure map, like the
    streaming guard this reuses).
    """
    from ..plans.exchange import ship_package
    from ..streaming.decontam import (_shingle_hash_array_inline,
                                      eval_ngram_hashes)

    spark = train_df.sparkSession
    ship_package(spark)
    ths = eval_ngram_hashes(test_df, text_col, id_col, n)
    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(ths, dtype=np.int64))

    # ORIGINAL-case tokens for the rebuild; hashing tokenizes lowered
    # (word_shingles parity) — lower() never changes whitespace, so
    # positions align between the two arrays
    toks_expr = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    tagged = (train_df
              .withColumn("__toks", F.expr(toks_expr))
              .withColumn("__sh", F.expr(
                  _shingle_hash_array_inline(text_col, n))))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in train_df.schema.fields) + ", `n_removed` int"

    def fn(batches):
        import pandas as pd

        ts = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            sh = [np.asarray(a, dtype=np.int64) for a in pdf["__sh"]]
            lens = np.fromiter((len(a) for a in sh), dtype=np.int64,
                               count=len(sh))
            flat = (np.concatenate(sh) if lens.sum()
                    else np.empty(0, np.int64))
            hit = (np.isin(flat, ts) if len(flat)
                   else np.empty(0, bool))
            offs = np.zeros(len(sh) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            texts, removed = [], []
            for d, toks in enumerate(pdf["__toks"]):
                toks = list(toks)
                starts = np.nonzero(hit[offs[d]:offs[d + 1]])[0]
                if not len(starts):
                    texts.append(" ".join(toks))
                    removed.append(0)
                    continue
                cover = np.zeros(len(toks), dtype=bool)
                for i in starts:
                    cover[i:i + n] = True
                texts.append(" ".join(
                    t for t, c in zip(toks, cover) if not c))
                removed.append(int(cover.sum()))
            res = pdf.drop(columns=["__toks", "__sh"]).copy()
            res[text_col] = texts
            res["n_removed"] = np.asarray(removed, dtype=np.int32)
            yield res

    return tagged.mapInPandas(fn, out_schema)


def dedup_incremental(new_df: DataFrame, text_col: str, id_col: str,
                      index_df: DataFrame | None = None
                      ) -> tuple[DataFrame, DataFrame]:
    """Exact dedup of a NEW ingest batch against a persisted
    fingerprint index — the incremental path: a growing corpus must
    not re-dedup 100 TB of history to admit today's crawl.

    ``index_df`` is the accumulated ``(fp)`` relation from prior
    batches (``None`` for the first).  Returns ``(survivors,
    updated_index)``: within-batch keep-first dedup, then a left-anti
    join against the index (AQE broadcasts it while it is small; store
    it bucketed by ``fp`` — ``writers.write_bucketed`` — and the
    anti-join runs exchange-free on the index side at any size).  The
    updated index appends only the SURVIVORS' fingerprints, so it
    stays O(distinct corpus texts).
    """
    batch = dedup_exact_keep_first(new_df, text_col, id_col) \
        .withColumn("__fp", md5_fingerprint(text_col))
    if index_df is not None:
        batch = batch.join(index_df.select(F.col("fp").alias("__fp")),
                           "__fp", "left_anti")
    survivors = batch.drop("__fp")
    delta = batch.select(F.col("__fp").alias("fp"))
    new_index = (delta if index_df is None
                 else index_df.select("fp").unionAll(delta))
    return survivors, new_index


#: raw 48-bit shingle hash (no modulus — all 48 bits feed the Bloom
#: probe schedule); twin: __spark_entry__._duck_md5hash48
_HASH48_EXPR = "CAST(conv(substring(md5(shingle), 1, 12), 16, 10) AS BIGINT)"


def bloom_bitmap(shingles: DataFrame, m_bits: int = 1 << 20,
                 k: int = 3) -> DataFrame:
    """Bloom-filter bitmap of a shingle relation, AS A RELATION:
    ``(word, mask)`` — ``m_bits/32`` 32-bit words, kept in BIGINT so
    no engine ever shifts into a sign bit — built with one explode(k
    positions) + one map-side-combined ``bit_or`` aggregate.

    Positions follow Kirsch–Mitzenmacher double hashing on the 48-bit
    md5 fold: ``pos_j = (h % m + j·(1 + h % (m−1))) % m`` — pure
    integer math, so an external engine (the DuckDB oracle) reproduces
    the filter bit-for-bit.  At 100 TB the bitmap table is KBs-to-MBs
    (2²⁰ bits = 32 K rows) regardless of test-set size — the point:
    exact decontamination must shuffle/broadcast every distinct test
    n-gram, the Bloom probe broadcasts only the bitmap.
    """
    if m_bits % 32:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    pos = (f"transform(sequence(0, {k - 1}), j -> "
           f"(h % {m_bits} + j * (1 + h % {m_bits - 1})) % {m_bits})")
    return (shingles.select(F.expr(_HASH48_EXPR).alias("h"))
            .select(F.explode(F.expr(pos)).alias("pos"))
            .select(F.expr("pos DIV 32").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 32 AS INT))").alias("bit"))
            .groupBy("word").agg(F.expr("bit_or(bit)").alias("mask")))


def bloom_merge(bitmap_a: DataFrame, bitmap_b: DataFrame) -> DataFrame:
    """OR-merge two :func:`bloom_bitmap` relations built with the SAME
    ``m_bits``/``k`` — Bloom filters are unions under bitwise OR, so an
    incremental ingest guard updates its persisted bitmap with one
    ≤ m/32-row aggregate instead of re-shingling history."""
    return (bitmap_a.unionByName(bitmap_b)
            .groupBy("word").agg(F.expr("bit_or(mask)").alias("mask")))


def near_dedup_incremental(new_df: DataFrame, text_col: str, id_col: str,
                           history_sigs: DataFrame | None = None,
                           threshold: float = 0.5, k: int = MINHASH_K,
                           n: int = 3, rows_per_band: int = 2,
                           max_bucket: int | None = None
                           ) -> tuple[DataFrame, DataFrame]:
    """NEAR-duplicate dedup of a new ingest batch against a persisted
    MinHash signature index — :func:`dedup_incremental`'s fuzzy
    sibling.  The index is the ``(id, mh_0…mh_{k-1})`` signature table
    of every prior survivor: k BIGINTs per document, no text retained —
    band keys AND the verification statistic both derive from it.

    Within-batch near-dups resolve exactly (band join + true-Jaccard
    verify + connected-components keep-first); cross-batch candidates
    come from a band equi-join new×history, and are confirmed by the
    MinHash Jaccard ESTIMATE (fraction of agreeing hashes ≥
    ``threshold`` — granularity 1/k; raise ``k`` for finer cuts) since
    the history text is gone.  Returns ``(survivors,
    updated_index)``; the index grows by the survivors' signatures
    only, so it stays O(distinct corpus docs) · k longs.
    """
    sh = word_shingles(new_df, text_col, id_col, n) \
        .localCheckpoint(eager=True)
    sigs_new = minhash_signatures_from_shingles(sh, k) \
        .localCheckpoint(eager=True)

    # 1. within-batch: exact verify + components keep-first
    pairs = minhash_band_pairs(sigs_new, k, rows_per_band,
                               max_bucket=max_bucket)
    verified = jaccard_verify(pairs, sh, threshold)
    from .graph import connected_components
    comp = connected_components(verified.select("id_a", "id_b"))
    drop_within = comp.where(F.col("id") != F.col("component")) \
        .select(F.col("id").alias(id_col))
    batch = new_df.join(drop_within, id_col, "left_anti")

    # 2. vs history: band join, then signature-agreement verify
    if history_sigs is not None:
        bn = minhash_band_keys(sigs_new, k, rows_per_band)
        bh = minhash_band_keys(history_sigs, k, rows_per_band) \
            .withColumnRenamed("id", "hist_id")
        cand = bn.join(bh, "band_key") \
            .select("id", "hist_id").distinct()
        hist_renamed = history_sigs.select(
            F.col("id").alias("hist_id"),
            *[F.col(f"mh_{i}").alias(f"hmh_{i}") for i in range(k)])
        agree = F.lit(0)
        for i in range(k):
            agree = agree + (F.col(f"mh_{i}") == F.col(f"hmh_{i}")) \
                .cast("int")
        flagged = (cand
                   .join(sigs_new, "id")
                   .join(hist_renamed, "hist_id")
                   .where(agree / F.lit(float(k)) >= threshold)
                   .select(F.col("id").alias(id_col)).distinct())
        batch = batch.join(flagged, id_col, "left_anti")

    surv_sigs = sigs_new.join(
        batch.select(F.col(id_col).alias("id")), "id", "left_semi")
    new_index = (surv_sigs if history_sigs is None
                 else history_sigs.unionByName(surv_sigs))
    return batch, new_index


def dedup_lines(df: DataFrame, text_col: str, id_col: str,
                min_df: int = 2) -> DataFrame:
    """Corpus-wide boilerplate LINE removal: drop every line whose
    exact text appears in ≥ ``min_df`` distinct documents — the
    "cookie banner / nav footer" cleanup that line-level rules
    (``c4_line_filter``: per-doc heuristics) and span dedup
    (``dedup_spans``: keep FIRST occurrence) don't express: a
    boilerplate line is removed from EVERY document, including the
    first.

    Returns the input rows with ``text_col`` rebuilt from surviving
    lines (newline-joined, original line order) plus
    ``n_lines_removed``.  Empty documents and documents losing every
    line come back with ``''``.

    Scale shape — all codegen, no Python: line explode (narrow) →
    distinct (doc, line-md5) → map-side-combined doc-frequency count
    keyed by the full 128-bit line MD5 (never line text; the full
    digest, not the engine's 48-bit fold — at billions of distinct
    lines a 48-bit key birthday-collides and would delete innocent
    lines) → the boilerplate relation joins back hash-keyed (AQE
    broadcasts it while small) → one groupBy(id) rebuild via the
    sort-free collect_list + array_sort struct trick (no window).
    Traffic is O(corpus lines) digests — the same asymptotics as the
    span dedup.
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    hashed = lines.withColumn("lh", F.md5("line"))
    boiler = (hashed.select("id", "lh").distinct()
              .groupBy("lh").agg(F.count(F.lit(1)).alias("df"))
              .where(F.col("df") >= min_df)
              .select("lh"))
    # plain hash join on the integer line-hash: AQE broadcasts the
    # boilerplate relation while it is small, and degrades to a
    # shuffled hash join if a pathological corpus makes it large —
    # never force-broadcast an unbounded relation
    marked = hashed.join(
        boiler.withColumn("__boiler", F.lit(True)), "lh", "left")
    rebuilt = (marked.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    F.col("__boiler").isNull(),
                    F.struct("pos", "line")))),
                lambda s: s.getField("line")), "\n").alias("__clean"),
        F.sum(F.col("__boiler").isNotNull().cast("int"))
        .cast("int").alias("n_lines_removed")))
    out = (df.join(rebuilt.withColumnRenamed("id", id_col), id_col,
                   "left")
           .withColumn(text_col, F.coalesce("__clean", F.lit("")))
           .withColumn("n_lines_removed",
                       F.coalesce("n_lines_removed", F.lit(0)))
           .drop("__clean"))
    return out


def squash_repeated_lines(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """WITHIN-document repeated-line removal: keep the FIRST
    occurrence of each exact line inside each document, preserving
    line order — the RefinedWeb-style cleanup for pages that repeat a
    cookie banner / nav block many times in ONE page, which
    corpus-wide line dedup (:func:`dedup_lines`, df ≥ min_df across
    DOCUMENTS) deliberately does not touch when the repetition is
    intra-document only.

    Returns the input rows with ``text_col`` rebuilt plus
    ``n_lines_squashed``.  Scale shape — all codegen, no Python, no
    quadratic per-doc work: line posexplode (narrow) → min(pos) per
    (id, line-md5) keeps the canonical occurrence → groupBy(id)
    rebuild via the sort-free collect_list + array_sort struct trick.
    Traffic is O(corpus lines) digests, keyed by (id, md5) so a
    boilerplate-heavy line never concentrates on one reducer.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    total = F.count(F.lit(1))
    firsts = (lines.groupBy("id", F.md5("line").alias("lh"))
              .agg(F.min("pos").alias("pos"),
                   F.min_by("line", "pos").alias("line"),
                   total.alias("occ")))
    rebuilt = (firsts.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct("pos", "line"))),
                lambda s: s.getField("line")), "\n").alias("__clean"),
        (F.sum("occ") - F.count(F.lit(1))).cast("int")
        .alias("n_lines_squashed")))
    # unmatched rows (NULL id — the left-join key never matches — or
    # NULL text) keep their INPUT text: a content-preserving op must
    # never silently blank a document (ADVICE r9)
    return (df.join(rebuilt.withColumnRenamed("id", id_col), id_col,
                    "left")
            .withColumn(text_col,
                        F.coalesce("__clean", F.col(text_col)))
            .withColumn("n_lines_squashed",
                        F.coalesce("n_lines_squashed", F.lit(0)))
            .drop("__clean"))


def dedup_paragraphs(df: DataFrame, text_col: str, id_col: str,
                     sep: str = "\n",
                     max_segments: int | None = None) -> DataFrame:
    """INTRA-document exact paragraph dedup: remove repeated
    ``sep``-delimited segments WITHIN each document, keeping the first
    occurrence — the "page rendered its nav twice / chat log echoes"
    cleanup that corpus-level rules can't express (:func:`dedup_lines`
    removes corpus-wide boilerplate from every doc; this removes a
    doc's self-repetition even when no other doc shares the line).

    Returns the input rows with ``text_col`` rebuilt from first
    occurrences (original order) plus ``n_paras_removed``.

    Scale shape — the whole operator is ONE narrow codegen'd
    expression: ``split`` → keep index *i* iff
    ``array_position(arr, arr[i]) == i`` → ``array_join``.  No
    explode, no shuffle, no Python: at 100 TB this runs at scan speed
    with zero exchange.  The position test is O(segments²) per
    document in the worst case, but entirely in-register; documents
    are KB-sized, not GB-sized, so compute never dominates the scan.
    For corpora that violate that contract (multi-MB docs with 10⁵+
    segments), pass ``max_segments`` — any document whose segment
    count exceeds it fails the job with an explicit error naming the
    offending id, instead of silently burning quadratic CPU; the
    caller then routes those docs through
    :func:`dedup_paragraphs_explode` (one shuffle, O(segments)).

    ``sep`` is a LITERAL delimiter (matching the docs'
    ``sep``-delimited phrasing and the DuckDB ``string_split`` twin),
    not a regex: separators containing regex metacharacters are
    \\Q…\\E-quoted before reaching ``F.split``, so ``"."`` or ``"|"``
    splits on the character itself.  Plain separators (``" "``,
    ``"\\n"``) pass through verbatim — quoting them would defeat
    Spark's non-regex literal-split fast path (measured 2.1× on the
    sf0.1 corpus, BASELINE.md round-8 note).
    """
    from ..plans.exchange import ensure_min_parallelism

    if _RX_SPECIAL.search(sep):
        # java.util.regex.Pattern.quote semantics: wrap in \Q…\E,
        # breaking out of the quote around any literal \E inside
        sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    else:
        sep_rx = sep
    # zero-exchange operators inherit the SCAN's split count, so a
    # small-but-CPU-quadratic table arriving as one file split runs
    # the whole position test on one core (optimization r13, guide
    # §2.5; measured 1.9 → 0.3 s at sf0.1, rows identical; no-op at
    # real scale where the scan has many splits)
    df = ensure_min_parallelism(df)
    arr = F.split(F.col(text_col), sep_rx)
    if max_segments is not None:
        arr = F.when(
            F.size(arr) > max_segments,
            F.raise_error(F.concat(
                F.lit(f"dedup_paragraphs: document "), F.col(id_col)
                .cast("string"),
                F.lit(f" has more than max_segments={max_segments} "
                      "segments; route oversized docs through "
                      "dedup_paragraphs_explode (O(segments), one "
                      "shuffle — PLANS.md)")))
        ).otherwise(arr)
    kept = F.filter(
        F.transform(arr, lambda x, i: F.struct(
            x.alias("s"), i.alias("i"))),
        lambda t: F.array_position(arr, t.getField("s"))
        == t.getField("i") + 1)
    return (df.withColumn("__kept", kept)
            .withColumn("n_paras_removed",
                        (F.size(arr) - F.size("__kept")).cast("int"))
            .withColumn(text_col,
                        F.array_join(F.transform(
                            F.col("__kept"),
                            lambda t: t.getField("s")), sep))
            .drop("__kept"))


def dedup_paragraphs_explode(df: DataFrame, text_col: str,
                             id_col: str,
                             sep: str = "\n") -> DataFrame:
    """The oversized-document escape hatch for
    :func:`dedup_paragraphs` (PLANS.md): identical semantics — keep
    the FIRST occurrence of each ``sep``-delimited segment per
    document — via posexplode + ``min(pos)`` + ordered rebuild.

    Costs one doc-keyed shuffle but is O(segments) per document where
    the expression path's in-register position test is O(segments²):
    use it for the ``max_segments``-violating slice (multi-MB docs,
    10⁵+ segments) and union with the narrow path serving the
    compliant slice.  Differential-tested equal to the expression
    path on every corpus the tests ship.
    """
    if _RX_SPECIAL.search(sep):
        sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    else:
        sep_rx = sep
    segs = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep_rx))
        .alias("pos", "seg"))
    firsts = (segs.groupBy("__id", "seg")
              .agg(F.min("pos").alias("pos"),
                   F.count(F.lit(1)).cast("int").alias("n_occ")))
    rebuilt = (firsts.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s.getField("seg")), sep).alias("__clean"),
        F.sum(F.col("n_occ") - 1).cast("int")
        .alias("n_paras_removed")))
    return (df.join(rebuilt.withColumnRenamed("__id", id_col),
                    id_col, "left")
            .withColumn(text_col, F.coalesce("__clean",
                                             F.col(text_col)))
            .withColumn("n_paras_removed",
                        F.coalesce("n_paras_removed", F.lit(0)))
            .drop("__clean"))


def compact_minhash_index(index: DataFrame,
                          k: int = MINHASH_K) -> DataFrame:
    """Vacuum a persisted :func:`near_dedup_incremental` signature
    index: keep ONE row (lowest id) per distinct k-hash signature
    vector.

    The index admits redundant rows over time — re-ingested ids, and
    identical-signature survivors that the ``max_bucket`` skew cap let
    through without a candidate pair — and it is append-only, so
    without a periodic vacuum it grows past O(distinct signatures).
    Dropping a row whose signature equals a kept row's is DECISION-
    PRESERVING, not lossy: band keys and the hash-agreement statistic
    are pure functions of the signature vector, so any future document
    flagged against the dropped row is flagged identically against
    the kept one.  (Near-identical-but-distinct signatures are NOT
    merged — that would change subsequent decisions.)

    One map-side-combinable aggregate on the k-BIGINT signature:
    shuffle traffic O(distinct signatures) · (k+1) longs, no text, no
    window.  Run it before persisting the index each ingest cycle (or
    on a schedule) to hold the index at survivors-only size.
    """
    cols = [f"mh_{i}" for i in range(k)]
    return (index.groupBy(*cols).agg(F.min("id").alias("id"))
            .select("id", *cols))


#: auto-sizing density: bits per distinct test n-gram (k=3 probes →
#: FP rate ≈ (1 − e^{−3/16})³ ≈ 0.5 %); a saturated filter stays
#: CORRECT (conservative) but over-drops — measured: the fixed 2²⁰
#: default at ~500 k test n-grams kept 685 of the exact rule's 1900
#: survivors, auto-sizing keeps 1887
_BLOOM_BITS_PER_NGRAM = 16


def bloom_decontaminate(train_df: DataFrame, test_df: DataFrame,
                        text_col: str, id_col: str, n: int = 5,
                        m_bits: int | None = None, k: int = 3,
                        verify: bool = True) -> DataFrame:
    """Test-set decontamination through a Bloom filter of the test
    n-grams — the scale path of :func:`decontaminate`.

    ``decontaminate`` joins train shingles against test shingles on the
    shingle itself: correct, but the join must move every distinct
    TRAIN n-gram through a shuffle keyed by text.  Here the test side
    compresses to an ``m_bits``-bit bitmap (32 K-row relation at the
    2²⁰ default) that BROADCASTS; the train side probes it with ``k``
    integer positions per shingle — one broadcast join, no text-keyed
    shuffle, traffic O(bitmap) instead of O(distinct test n-grams).

    A shingle is flagged iff ALL ``k`` probed bits are set, so the
    contaminated-id set is a deterministic SUPERSET of the exact rule's
    (Bloom false positives drop extra train docs — the conservative
    direction for decontamination; FP rate ≈ (1−e^{−kN/m})^k).
    Returns the surviving train rows.

    ``m_bits=None`` (default) sizes the filter from the data —
    ``_BLOOM_BITS_PER_NGRAM`` bits per distinct test n-gram, estimated
    with one ``approx_count_distinct`` over the integer hashes (no text
    shuffle) — because a fixed m silently saturates on a large test
    set and over-drops.  Pin ``m_bits`` explicitly when an external
    system must reproduce the filter (the oracle-gated configuration).

    ``verify=True`` (default) makes the result EXACT: per-shingle FPs
    compound per document (a doc with S shingles false-flags with
    probability 1−(1−p)^S — measured on a 50 % split at sf0.1: pure
    Bloom kept 1525 of the exact rule's 1900 survivors even
    auto-sized), so the filter serves as a PRE-FILTER and the flagged
    (id, h, shingle) candidates — a tiny relation at sane FP rates —
    are confirmed against the actual test shingles by integer-hash
    join + text equality.  The exact rule's full text-keyed shuffle is
    replaced by an h-keyed join whose payload carries candidate text
    only.  ``verify=False`` keeps the raw conservative-superset
    semantics (the deterministic, oracle-checkable mode).
    """
    # distinct=False: the shingle text never keys a shuffle anywhere in
    # this operator — bit_or (bitmap) and the probe joins below are
    # idempotent under duplicate shingles, so the dedup pass the exact
    # operator needs is pure cost here
    te = word_shingles(test_df, text_col, id_col, n, distinct=False)
    reuses = int(m_bits is None) + int(verify)      # beyond bitmap build
    if reuses:
        # a decontamination test set is small relative to train by
        # premise, so materializing its shingles once (bounded by test
        # size, never train size) beats re-deriving them per consumer
        te = te.localCheckpoint(eager=False)
    if m_bits is None:
        n_est = te.select(F.expr(_HASH48_EXPR).alias("h")) \
            .agg(F.approx_count_distinct("h").alias("n")).first()["n"]
        m_bits = max(1 << 20,
                     32 * -(-(_BLOOM_BITS_PER_NGRAM * int(n_est)) // 32))
    # eager checkpoint: the k probe joins below each broadcast the
    # bitmap, and without materialization each broadcast would re-run
    # the whole build aggregate.  The relation is ≤ m_bits/32 rows
    # (0.5 MB at the 2²⁰ default) — bounded by the filter size chosen,
    # never by data volume.
    bitmap = bloom_bitmap(te, m_bits, k).localCheckpoint(eager=True)
    tr = word_shingles(train_df, text_col, id_col, n, distinct=False)
    # k probes as k successive BROADCAST hash joins against the 32 K-row
    # bitmap relation, filtering after each one — all map-side in one
    # codegen stage (no explode, no O(k·shingles) probe shuffle; a
    # failed probe filters the row out before the remaining joins).
    # Because the probe path never shuffles, carrying the shingle text
    # along (verify mode) is free — it saves the second full train scan
    # the verify step would otherwise need to re-derive candidate text.
    carry = ["shingle"] if verify else []
    flagged = tr.select("id", F.expr(_HASH48_EXPR).alias("h"), *carry)
    for j in range(k):
        pos = f"(h % {m_bits} + {j} * (1 + h % {m_bits - 1})) % {m_bits}"
        bj = bitmap.select(F.col("word").alias(f"w{j}"),
                           F.col("mask").alias(f"m{j}"))
        flagged = (flagged
                   .withColumn(f"p{j}", F.expr(pos))
                   .join(F.broadcast(bj),
                         F.expr(f"p{j} DIV 32") == F.col(f"w{j}"), "left")
                   .where(F.expr(
                       f"(shiftright(coalesce(m{j}, CAST(0 AS BIGINT)), "
                       f"CAST(p{j} % 32 AS INT)) & 1) = 1")))
    flagged = flagged.select("id", "h", *carry)
    if verify:
        # confirm candidates against the real test shingles: h-keyed
        # integer join, text only as payload.  48-bit hash collisions
        # could mask a true match (prob ~2^-48 per pair).
        cand = flagged.dropDuplicates(["id", "h"])
        teh = te.select(F.expr(_HASH48_EXPR).alias("h"),
                        F.col("shingle").alias("te_shingle")) \
            .dropDuplicates(["h"])
        contaminated = (cand.join(teh, "h")
                        .where(F.col("shingle") == F.col("te_shingle"))
                        .select(F.col("id").alias(id_col)).distinct())
    else:
        contaminated = flagged.select(F.col("id").alias(id_col)) \
            .distinct()
    return train_df.join(contaminated, id_col, "left_anti")


def contamination_report(train_df: DataFrame, test_df: DataFrame,
                         text_col: str, id_col: str,
                         n: int = 5) -> DataFrame:
    """Quantify train/test n-gram overlap WITHOUT dropping anything —
    the measurement the decontamination decision is made from.  One
    row: (n_test_ngrams, n_overlapping, overlap_share,
    n_test_docs_hit, n_test_docs).

    A test doc is "hit" if ANY of its n-grams occurs in train — the
    same rule :func:`decontaminate` enforces from the train side, so
    this report forecasts exactly what that operator would remove.

    Plan: both sides reduce to distinct 48-bit shingle hashes (text
    never keys a shuffle — the md5 fold happens map-side); test pairs
    LEFT-join the train hash set (unique key ⇒ no fanout) and ONE
    multi-countDistinct aggregate produces every statistic — the train
    corpus is scanned and shuffled exactly once, where the per-count
    action shape re-ran its distinct per statistic (the funnel
    cross-action-recompute class, VERDICT r03 #3).  Traffic is
    O(distinct n-grams) longs, output is one row.
    """
    te = word_shingles(test_df, text_col, id_col, n, distinct=False) \
        .select("id", F.expr(_HASH48_EXPR).alias("h")) \
        .dropDuplicates(["id", "h"])
    tr_h = (word_shingles(train_df, text_col, id_col, n, distinct=False)
            .select(F.expr(_HASH48_EXPR).alias("h")).distinct()
            .withColumn("__in_tr", F.lit(1)))
    marked = te.join(tr_h, "h", "left")
    hit = F.col("__in_tr").isNotNull()
    stats = marked.agg(
        F.countDistinct("h").alias("n_test"),
        F.countDistinct(F.when(hit, F.col("h"))).alias("n_hit"),
        F.countDistinct(F.when(hit, F.col("id"))).alias("n_docs_hit"),
    ).first()
    n_test, n_hit, n_docs_hit = (stats["n_test"], stats["n_hit"],
                                 stats["n_docs_hit"])
    # separate cheap action: docs with < n tokens emit no shingles, so
    # the denominator must come from the raw test relation
    n_docs = test_df.select(id_col).distinct().count()
    import math

    spark = train_df.sparkSession
    # floor(x·10⁶ + 0.5): round-half-up, engine-portable (Python round
    # is banker's; DuckDB/Spark ROUND are HALF_UP — same idiom as
    # quantize_int8)
    share = (math.floor(n_hit / n_test * 1e6 + 0.5) / 1e6
             if n_test else 0.0)
    return spark.createDataFrame(
        [(n_test, n_hit, share, n_docs_hit, n_docs)],
        "n_test_ngrams bigint, n_overlapping bigint, "
        "overlap_share double, n_test_docs_hit bigint, "
        "n_test_docs bigint")


def dedup_spans(df: DataFrame, text_col: str, id_col: str,
                span_tokens: int = 20) -> DataFrame:
    """Span-level exact dedup across the corpus (the C4 "three-sentence
    line dedup" generalized to fixed token windows): every document is
    cut into consecutive ``span_tokens``-token spans; a span that
    occurs anywhere earlier in the corpus (order: (id, span index)) is
    DELETED from later documents, and each document is re-assembled
    from its surviving spans — boilerplate (headers, footers, license
    blocks) vanishes from every copy but the first.

    Tokenization is case-preserving whitespace split, so re-assembly
    (single-space join) normalizes whitespace but nothing else.
    Returns ``id, text_clean, n_spans, n_kept`` (documents whose every
    span was seen before come back with empty text — the caller decides
    whether that means drop).

    Plan: narrow posexplode → map-side-combined groupBy (id, span_idx)
    re-assembling span strings → ONE window shuffle keyed on the span
    MD5 (first-occurrence rank; hot spans — the boilerplate itself —
    are one group per distinct span, bounded by corpus dedup pressure)
    → groupBy(id) re-assembly.  Shuffle traffic is O(spans), and span
    strings travel hashed where only identity matters.
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.expr(
            f"filter(split({text_col}, '\\\\s+'), x -> x != '')"))
        .alias("pos", "tok"))
    spans = (toks.withColumn("span_idx",
                             F.expr(f"CAST(pos DIV {int(span_tokens)} "
                                    "AS BIGINT)"))
             .groupBy("id", "span_idx")
             .agg(F.concat_ws(" ", F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                 lambda s: s.getField("tok"))).alias("span")))
    w = Window.partitionBy(F.md5("span")).orderBy(
        F.col("id").asc(), F.col("span_idx").asc())
    kept = (spans.withColumn("__rk", F.row_number().over(w))
            .withColumn("__keep", F.col("__rk") == 1))
    return (kept.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                 F.sum(F.when(F.col("__keep"), 1).otherwise(0))
                 .cast("bigint").alias("n_kept"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         "span_idx",
                         F.when(F.col("__keep"), F.col("span"))
                         .otherwise(F.lit(None)).alias("s")))),
                     lambda s: s.getField("s"))).alias("text_clean"))
            .select("id", "text_clean", "n_spans", "n_kept"))


def dedup_substrings(df: DataFrame, text_col: str, id_col: str,
                     min_tokens: int = 50) -> DataFrame:
    """Exact substring-level dedup (the ExactSubstr operation of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    suffix-array formulation re-expressed relationally): every
    ``min_tokens``-token window that occurred anywhere earlier in the
    corpus (order: (id, position)) marks its tokens for deletion, and
    each document is re-assembled from its unmarked tokens.  Because
    windows slide at stride 1, ANY duplicated token run of length ≥
    min_tokens is covered by marked windows across its whole length —
    the same guarantee the suffix array gives — while runs shorter than
    min_tokens never match.  Returns ``id, text_clean, n_tokens,
    n_removed`` (documents shorter than ``min_tokens`` pass through
    whole; re-assembly joins with single spaces).

    The canonical (first) occurrence keeps its tokens even when it
    overlaps another duplicate's removal — the greedy first-wins rule
    that makes the operator deterministic and engine-portable.

    Plan: windows are hashed IN the scan projection (``transform`` over
    the token array — the L-token span text never leaves the stage;
    shuffle rows are (id, pos, 16-byte hash), O(corpus tokens) total)
    → ONE window shuffle on the span hash (first-occurrence rank; hot
    hashes are the duplicated content itself, bounded by dedup
    pressure) → marked windows explode to token positions (fanout
    min_tokens × duplicated windows only) → anti-join against the
    token stream on (id, pos) → groupBy(id) re-assembly, joined back
    to the full corpus so untouched documents pass through.
    """
    L = int(min_tokens)
    if L < 1:
        raise ValueError(f"min_tokens must be >= 1, got {L}")
    from ..plans.exchange import ensure_min_parallelism

    t = (f"filter(split(coalesce({text_col}, ''), '\\\\s+'), "
         "x -> x != '')")
    base = df.select(F.col(id_col).alias("id"),
                     F.expr(t).alias("__toks"))
    # tokenize/window/posexplode chains are CPU-bound narrow passes;
    # repartition the tiny-scan case up to cluster parallelism so they
    # never serialize on one file split (optimization r13, guide §2.5
    # — no-op at real scale); positions explode before the per-window
    # hash so no per-doc window-hash array materializes (the
    # _char_windows build shape)
    pbase = ensure_min_parallelism(base)
    # sequence(0, n-L) counts DOWN when n < L — short docs must not
    # enter the window build at all
    wins = (pbase.where(F.size("__toks") >= L)
            .select("id", "__toks",
                    F.explode(F.expr(
                        f"sequence(0, size(__toks) - {L})")).alias("p"))
            .select("id", "p",
                    F.md5(F.expr(
                        f"concat_ws(' ', slice(__toks, p + 1, {L}))"))
                    .alias("h")))
    rk = Window.partitionBy("h").orderBy(F.col("id").asc(),
                                         F.col("p").asc())
    marked = (wins.withColumn("__rk", F.row_number().over(rk))
              .where(F.col("__rk") > 1)
              .select("id", F.explode(F.expr(
                  f"sequence(p, p + {L - 1})")).alias("pos"))
              .distinct())
    toks = pbase.select("id", F.posexplode("__toks").alias("pos", "tok"))
    kept = toks.join(marked, ["id", "pos"], "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.concat_ws(" ", F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                   lambda s: s.getField("tok"))).alias("__clean"),
                    F.count(F.lit(1)).cast("bigint").alias("__n_kept")))
    return (base.select("id", F.size("__toks").cast("bigint")
                        .alias("n_tokens"))
            .join(rebuilt, "id", "left")
            .select("id",
                    F.coalesce(F.col("__clean"), F.lit(""))
                    .alias("text_clean"),
                    "n_tokens",
                    (F.col("n_tokens")
                     - F.coalesce(F.col("__n_kept"), F.lit(0)))
                    .cast("bigint").alias("n_removed")))


def fuzzy_decontaminate(train_df: DataFrame, test_df: DataFrame,
                        text_col: str, id_col: str,
                        threshold: float = 0.5, k: int = MINHASH_K,
                        n: int = 3, rows_per_band: int = 2,
                        max_candidates: int | None = None) -> DataFrame:
    """NEAR-duplicate test-set decontamination: drop every train doc
    whose exact shingle-set Jaccard vs ANY test doc is ≥ ``threshold``.

    :func:`decontaminate` drops a train doc for sharing a single exact
    n-gram with the test set — the GPT-3 rule: high recall on verbatim
    leakage, but (a) blind to paraphrased/reformatted test material
    with no exact n-gram in common at the configured n, and (b) happy
    to drop a doc for one incidental idiom.  This operator closes both
    gaps: MinHash-LSH band keys (train × test equi-join) generate
    candidates, exact Jaccard over both sides' shingles confirms them
    — whole-document near-identity, not single-phrase overlap.

    Train and test ids must be disjoint (they are when the two sides
    come from one :func:`~..sampling.split_by_hash` split).

    Scale: the test side is small relative to train by premise, so its
    band keys BROADCAST — the train side never shuffles to generate
    candidates; the verify join fans out only over candidate pairs
    (``max_candidates`` bounds it exactly as in :func:`jaccard_verify`).
    """
    verified = fuzzy_join_pairs(train_df, test_df, text_col, id_col,
                                threshold, k, n, rows_per_band,
                                max_candidates)
    contaminated = verified.select(F.col("id_a").alias(id_col)).distinct()
    return train_df.join(contaminated, id_col, "left_anti")


def fuzzy_join_pairs(df_a: DataFrame, df_b: DataFrame, text_col: str,
                     id_col: str, threshold: float = 0.5,
                     k: int = MINHASH_K, n: int = 3,
                     rows_per_band: int = 2,
                     max_candidates: int | None = None) -> DataFrame:
    """Cross-table near-duplicate record linkage:
    ``(id_a, id_b, jaccard)`` pairs with exact shingle-set Jaccard ≥
    ``threshold`` between a row of ``df_a`` and a row of ``df_b`` —
    the entity-resolution / provenance-matching join (link a scraped
    corpus to a licensed master copy, today's crawl to yesterday's)
    that an equi-join can't express because the keys are fuzzy text.

    The verify half of :func:`fuzzy_dedup` turned into a positive
    cross-table join (also the candidate machinery behind
    :func:`fuzzy_decontaminate`, which keeps only the anti-join):
    MinHash-LSH band keys of the SMALLER side (``df_b`` by convention)
    broadcast against ``df_a``'s — side A never shuffles to generate
    candidates — then exact Jaccard confirms each pair.  Ids of the
    two sides must be disjoint.

    Band recall is governed by (k, rows_per_band) exactly as in
    :func:`minhash_near_dups` — pairs below the LSH S-curve's knee can
    be missed by candidate generation; raise ``rows_per_band``
    granularity or k for higher recall at lower thresholds.
    """
    sh_a = word_shingles(df_a, text_col, id_col, n) \
        .localCheckpoint(eager=True)
    sh_b = word_shingles(df_b, text_col, id_col, n) \
        .localCheckpoint(eager=True)
    sig_a = minhash_signatures_from_shingles(sh_a, k)
    sig_b = minhash_signatures_from_shingles(sh_b, k)
    ba = minhash_band_keys(sig_a, k, rows_per_band) \
        .withColumnRenamed("id", "id_a")
    bb = minhash_band_keys(sig_b, k, rows_per_band) \
        .withColumnRenamed("id", "id_b")
    cand = (ba.join(F.broadcast(bb), "band_key")
            .select("id_a", "id_b").distinct())
    # Verify-stage scale note: `cand` is a vanishing fraction of A
    # (bounded by band collisions with the small B side), so AQE
    # broadcasts it into jaccard_verify's two joins — the shingle
    # corpus is scanned narrowly, never shuffled, to confirm the
    # pairs; the only corpus-wide shuffle in the whole operator is the
    # map-side-combined per-doc size aggregate (O(docs) traffic).  An
    # explicit semi-join prune of the shingle relation was measured
    # SLOWER (3 extra jobs) with no shuffle saved.
    return jaccard_verify(cand, sh_a.unionByName(sh_b), threshold,
                          max_candidates=max_candidates)


def lsh_recall_audit(df: DataFrame, text_col: str, id_col: str,
                     n: int = 3, k: int = MINHASH_K,
                     rows_per_band: int = 2, min_jaccard: float = 0.05,
                     buckets: int = 10,
                     max_df: int | None = _MAX_DF_UNSET) -> DataFrame:
    """EMPIRICAL recall audit of the banded-MinHash candidate
    generator against exact n-gram-Jaccard ground truth:
    ``(bucket, n_pairs, n_caught)`` — bucket = ``floor(j·buckets)``
    capped at ``buckets−1``, ``n_caught`` = pairs of that similarity
    that the band join actually surfaces.

    :func:`~.similarity.lsh_band_recall` gives the THEORETICAL
    ``1 − (1 − j^r)^b`` S-curve; this measures the real one on the
    real corpus — shingle-set sizes, hash collisions, and banding
    quirks included — so the dedup stack's central approximation is
    auditable per corpus instead of assumed.  Low-similarity buckets
    SHOULD show low catch rates (that's the point of banding); a low
    rate in the top bucket means r/b are mistuned for the threshold.

    Scale shape: ground truth reuses the posting-list inverted-index
    join (``max_df`` prunes stop-shingle postings exactly as
    :func:`ngram_jaccard_near_dups` documents, finite by DEFAULT; at
    corpus scale run the audit on a hash-sampled slice, the estimate
    is what matters);
    candidates reuse the banded self-join; the final mark is one hash
    join on (id_a, id_b) + a map-side-combined groupBy over ≤
    ``buckets`` rows.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if max_df is _MAX_DF_UNSET:
        max_df = DEFAULT_MAX_DF
        _note_default_prune("lsh_recall_audit")
    # ONE shingle materialization shared by both legs (optimization
    # r12): the exact-Jaccard reference and the MinHash signatures
    # each tokenized the corpus independently before
    sh = word_shingles(df, text_col, id_col, n) \
        .localCheckpoint(eager=True)
    exact = ngram_jaccard_near_dups(df, text_col, id_col,
                                    threshold=min_jaccard, n=n,
                                    max_df=max_df, shingles=sh)
    sigs = minhash_signatures_from_shingles(sh, k=k)
    cand = minhash_band_pairs(sigs, k=k, rows_per_band=rows_per_band) \
        .withColumn("__hit", F.lit(True))
    marked = exact.join(cand, ["id_a", "id_b"], "left")
    bucket = F.least(F.floor(F.col("jaccard") * buckets),
                     F.lit(buckets - 1)).cast("int")
    return (marked.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.sum(F.col("__hit").isNotNull().cast("bigint"))
                 .cast("bigint").alias("n_caught")))


def containment_pairs(df: DataFrame, text_col: str, id_col: str,
                      threshold: float = 0.9, n: int = 3,
                      max_df: int | None = _MAX_DF_UNSET) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by shingle containment:
    ``(id_a, id_b, containment, jaccard)`` with
    ``containment = |A ∩ B| / min(|A|, |B|) ≥ threshold`` — the
    "document B embeds/quotes document A" detector.  Symmetric Jaccard
    misses exactly this case: a 50-shingle doc wholly contained in a
    5000-shingle doc has J ≈ 0.01 but containment 1.0, and quote-
    inclusion families are a major dedup leak in web corpora
    (Broder's original resemblance/containment pair).

    Jaccard rides along so consumers can classify: high containment +
    high Jaccard = ordinary near-dup; high containment + LOW Jaccard =
    asymmetric inclusion (usually keep the superset, drop the quote).

    Scale shape: identical to :func:`ngram_jaccard_near_dups` — the
    posting-list inverted-index join generates candidates (``max_df``
    prunes stop-shingle postings, finite by DEFAULT — ``max_df=None``
    is the explicit exact-semantics opt-in), sizes broadcast back,
    one exact filter.  Containment needs no new machinery, only the min() in
    the denominator.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_df is _MAX_DF_UNSET:
        max_df = DEFAULT_MAX_DF
        _note_default_prune("containment_pairs")
    sh = word_shingles(df, text_col, id_col, n).localCheckpoint(eager=True)
    posting = sh
    if max_df is not None:
        rare = (sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df_s"))
                .where(F.col("df_s") <= max_df).select("shingle"))
        posting = sh.join(rare, "shingle")
    a = posting.select(F.col("id").alias("id_a"),
                       F.col("shingle").alias("s"))
    b = posting.select(F.col("id").alias("id_b"),
                       F.col("shingle").alias("s"))
    inter = (a.join(b, "s")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / F.least("n_a", "n_b")).alias("containment"),
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .where(F.col("containment") >= threshold))


def _char_windows(base: DataFrame, L: int, verify: bool) -> DataFrame:
    """Stride-1 L-char windows of ``base(id, __t)`` as ``(id, p, k)``
    rows — k is the window text itself (``verify=True``,
    collision-free) or its md5 as a 16-byte BINARY (constant-width
    shuffle rows; ``unhex`` halves the key bytes vs the 32-char hex
    form with the same 128-bit collision odds — optimization r12,
    guide §2.3 narrower types: the window-count shuffle IS this
    family's cost).  Docs shorter than L produce no rows (sequence()
    counts DOWN when length < L, so they must not enter the build).

    Build shape (optimization r13, guide §2.5 input skew + §1.2): the
    window build is O(chars · L) CPU, so (a) the corpus is
    repartitioned up to cluster parallelism first — a small-but-
    expensive table otherwise arrives as ONE file split and the whole
    explode+hash chain serializes on one core (no-op at real scale,
    where the scan has many splits); (b) positions explode FIRST and
    the substring/md5 is projected AFTER the explode, inside the same
    whole-stage codegen — the previous transform() form materialized a
    per-doc array of L-char window strings before exploding it.
    Measured together at sf0.1: spans 4.4 → 1.3 s med, excise
    6.2 → 1.8 s med, interleaved A/B, outputs byte-identical."""
    from ..plans.exchange import ensure_min_parallelism

    key = (F.expr(f"substring(__t, p + 1, {L})") if verify
           else F.unhex(F.md5(F.expr(f"substring(__t, p + 1, {L})"))))
    return (ensure_min_parallelism(base.where(F.length("__t") >= L))
            .select("id", "__t",
                    F.explode(F.expr(f"sequence(0, length(__t) - {L})"))
                    .alias("p"))
            .select("id", "p", key.alias("k")))


def repeated_substring_spans(df: DataFrame, text_col: str,
                             id_col: str, min_len: int = 20,
                             verify: bool = True,
                             windows: DataFrame | None = None,
                             skew_safe: bool = False) -> DataFrame:
    """Exact repeated-substring coverage at CHARACTER granularity —
    the true ExactSubstr guarantee of Lee et al. ("Deduplicating
    Training Data Makes Language Models Better", whose reference
    implementation builds a corpus suffix array): every maximal span
    of characters that lies inside SOME substring of length >=
    ``min_len`` occurring at two or more positions in the corpus
    (intra- or cross-document, overlapping occurrences count).
    Returns ``(id, start, length, n_windows)`` — 0-based char offset,
    maximal-span length, and the number of duplicated ``min_len``
    windows merged into the span.  Documents with no duplicated
    content produce no rows; this is the ANALYSIS surface (what would
    ExactSubstr excise, and where) — ``dedup_substrings`` is the
    rewrite twin at token granularity.

    Relational re-expression of the suffix-array formulation: a
    position i is covered by a repeated substring of length >= L iff
    some stride-1 L-char window containing i is itself duplicated
    (any repeated s with |s| >= L contains a duplicated L-window over
    every position it covers; a duplicated L-window IS a repeated
    substring) — so the union of duplicated L-windows EQUALS the
    any-length->=L coverage a suffix array/automaton derives, and the
    per-document interval union below reconstructs the maximal spans.
    The equivalence is asserted against a generalized suffix-automaton
    reference on adversarial overlapping-repeat corpora in
    tests/test_exact_substr.py.

    ``verify=True`` groups windows ON THEIR CHARACTERS — collision-
    FREE exactness, shuffling L chars/position (linear, but an L-fold
    byte inflation).  ``verify=False`` ships the 16-byte md5 instead
    (the ``dedup_substrings`` trade: 2^-128-per-pair collision odds,
    constant-width shuffle rows) — the 100 TB default where L-fold
    inflation matters more than cryptographic certainty.

    Plan: window positions explode in the scan stage and the
    window hash projects post-explode in the same codegen (no
    Python; see _char_windows), ONE window-function shuffle keyed on
    the window for the occurrence count (hot keys are the duplicated
    content itself, bounded by dedup pressure — the
    dedup_substrings/dedup_spans argument), one per-document window
    pass for the gaps-and-islands interval union, one
    map-side-combinable groupBy for the span rows.  Nothing
    quadratic, nothing driver-side.

    ``skew_safe=True`` swaps the count-over-window for a map-side-
    combinable groupBy count + key equi-join (AQE skew-join
    splittable) — for corpora where one boilerplate window could be
    pathologically hot.  Measured trade at sf1: the join plan
    evaluates the window build twice and moves the key set a second
    time, costing ~2.5-3× the window form — so the window form is
    the default and the join form is the insurance policy.  Callers
    running spans AND excision over one corpus can materialize
    ``_char_windows(base, L, verify)`` once (persist or
    localCheckpoint) and pass it as ``windows``.
    """
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {L}")
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    wins = windows if windows is not None \
        else _char_windows(base, L, verify)
    if skew_safe:
        dupk = (wins.groupBy("k")
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") >= 2).select("k"))
        dup = wins.join(dupk, "k").select("id", "p")
    else:
        cnt = Window.partitionBy("k")
        dup = (wins.withColumn("__n", F.count(F.lit(1)).over(cnt))
               .where(F.col("__n") >= 2)
               .select("id", "p"))
    ordered = Window.partitionBy("id").orderBy("p")
    spans = (dup.withColumn(
        "__new", F.when(
            F.col("p") > F.lag("p", 1, -L).over(ordered) + L,
            1).otherwise(0))
        .withColumn("__span", F.sum("__new").over(
            Window.partitionBy("id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0))))
    return (spans.groupBy("id", "__span")
            .agg(F.min("p").cast("bigint").alias("start"),
                 (F.max("p") - F.min("p") + L).cast("bigint")
                 .alias("length"),
                 F.count(F.lit(1)).cast("bigint").alias("n_windows"))
            .select("id", "start", "length", "n_windows"))


def dedup_substrings_chars(df: DataFrame, text_col: str, id_col: str,
                           min_len: int = 50,
                           verify: bool = True,
                           windows: DataFrame | None = None,
                           skew_safe: bool = False) -> DataFrame:
    """Character-level ExactSubstr DELETION (Lee et al.'s actual
    rewrite step, which their suffix-array implementation performs on
    byte offsets) — the excision twin of
    :func:`repeated_substring_spans` and the char-granularity sibling
    of the token-level :func:`dedup_substrings`: every ``min_len``-char
    window that occurred anywhere earlier in the corpus (order:
    (id, position)) marks its characters for deletion, and each
    document is re-assembled from its unmarked characters — so ANY
    duplicated character run of length >= min_len survives only at
    its first occurrence, byte-exactly, with no tokenization
    normalization at all (the token-level form re-joins on single
    spaces; this one preserves every byte it keeps).

    Returns ``(id, text_clean, n_chars, n_removed)``; documents
    shorter than ``min_len`` pass through whole.  The canonical
    (first) occurrence keeps its characters even when it overlaps a
    later duplicate's removal — the deterministic first-wins rule of
    the token-level operator.  ``verify`` as in
    :func:`repeated_substring_spans` (char keys = collision-free,
    md5 = the constant-width 100 TB shuffle).

    Plan: the window build and first-occurrence window rank are the
    spans operator's (one shuffle on the window key; hot keys
    bounded by dedup pressure — the dedup_substrings precedent);
    marked positions collapse per document via the same
    gaps-and-islands interval union; re-assembly is ONE
    whole-stage-codegen ``aggregate`` fold over the <= len/L merged
    intervals — characters never explode (the token-level form
    posexplodes every token; here a document's text travels as one
    value end-to-end).  ``windows`` / ``skew_safe`` as in
    :func:`repeated_substring_spans` (the skew-safe form derives the
    canonical occurrence from a map-side-combinable
    ``min(struct(id, p))`` groupBy + equi-join instead of the
    row_number window — same measured ~2.5-3× trade).
    """
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {L}")
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    wins = windows if windows is not None \
        else _char_windows(base, L, verify)
    if skew_safe:
        canon = (wins.groupBy("k")
                 .agg(F.min(F.struct("id", "p")).alias("__c"),
                      F.count(F.lit(1)).alias("__n"))
                 .where(F.col("__n") >= 2)
                 .select("k", "__c"))
        marked = (wins.join(canon, "k")
                  .where((F.col("id") != F.col("__c.id"))
                         | (F.col("p") != F.col("__c.p")))
                  .select("id", "p"))
    else:
        rk = Window.partitionBy("k").orderBy(F.col("id").asc(),
                                             F.col("p").asc())
        marked = (wins.withColumn("__rk", F.row_number().over(rk))
                  .where(F.col("__rk") > 1).select("id", "p"))
    ordered = Window.partitionBy("id").orderBy("p")
    ivs = (marked.withColumn(
        "__new", F.when(
            F.col("p") > F.lag("p", 1, -L).over(ordered) + L,
            1).otherwise(0))
        .withColumn("__span", F.sum("__new").over(
            Window.partitionBy("id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("id", "__span")
        .agg(F.min("p").cast("int").alias("start"),
             (F.max("p") + L - 1).cast("int").alias("end"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("start", "end")))
             .alias("__ivs")))
    fold = (
        "aggregate(__ivs, struct(CAST('' AS STRING) AS s, 0 AS cur), "
        "(acc, iv) -> struct(concat(acc.s, substring(__t, acc.cur + 1,"
        " iv.start - acc.cur)), iv.end + 1), "
        "acc -> concat(acc.s, substring(__t, acc.cur + 1, "
        "length(__t) - acc.cur)))")
    removed = ("aggregate(__ivs, 0, "
               "(acc, iv) -> acc + iv.end - iv.start + 1)")
    return (base.join(ivs, "id", "left")
            .select("id",
                    F.when(F.col("__ivs").isNull(), F.col("__t"))
                    .otherwise(F.expr(fold)).alias("text_clean"),
                    F.length("__t").cast("bigint").alias("n_chars"),
                    F.coalesce(F.expr(removed), F.lit(0))
                    .cast("bigint").alias("n_removed")))


def _global_dense_rank(df: DataFrame, key_cols, n_parts: int = 32
                       ) -> DataFrame:
    """Distributed global DENSE rank over ``key_cols`` (1-based; equal
    keys share a rank) without ever collecting rows or funnelling the
    relation through a single task: range-partition sort on the keys
    (materialized ONCE — the range partitioner samples, so the stats
    and assign passes must see the same physical partitions), local
    dense ranks per partition (Arrow batches), then a driver-side
    prefix-offset over ONE (first_key, last_key, n_distinct) row per
    partition — the classic two-pass ranking that replaces Spark's
    single-partition ``Window.orderBy`` ranking at scale."""
    return _global_dense_rank_counted(df, key_cols, n_parts)[0]


def _global_dense_rank_counted(df: DataFrame, key_cols,
                               n_parts: int = 32):
    """:func:`_global_dense_rank` plus the TOTAL number of distinct
    key classes — free from the driver prefix-sum, so callers that
    need the cardinality (the prefix-doubling fixed-point test) skip
    a whole countDistinct pass per round."""
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    keys = list(key_cols)
    srt = (df.repartitionByRange(n_parts, *keys)
           .sortWithinPartitions(*keys)
           .localCheckpoint(eager=True))

    def stats(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first = last = None
        transitions = 0
        for pdf in batches:
            if not len(pdf):
                continue
            kv = list(zip(*(pdf[c] for c in keys)))
            if first is None:
                first = kv[0]
            elif kv[0] != last:
                transitions += 1
            for a, b in zip(kv, kv[1:]):
                if b != a:
                    transitions += 1
            last = kv[-1]
        if first is not None:
            yield pd.DataFrame(
                [(pid, repr(first), repr(last), transitions + 1)],
                columns=["pid", "first_key", "last_key", "n_distinct"])

    meta = srt.mapInPandas(
        stats, "pid int, first_key string, last_key string, "
               "n_distinct bigint").collect()
    meta.sort(key=lambda r: r["pid"])
    offsets, run = {}, 0
    prev_last = None
    for r in meta:
        adj = 1 if prev_last is not None and \
            r["first_key"] == prev_last else 0
        offsets[r["pid"]] = run - adj
        run += r["n_distinct"] - adj
        prev_last = r["last_key"]
    boff = spark.sparkContext.broadcast(offsets)

    n_classes = run

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in srt.schema
    ) + ", __rank bigint"

    def assign(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = boff.value.get(pid, 0)
        local = 0
        prev = None
        for pdf in batches:
            if not len(pdf):
                continue
            kv = list(zip(*(pdf[c] for c in keys)))
            ranks = []
            for t in kv:
                if prev is None or t != prev:
                    local += 1
                    prev = t
                ranks.append(off + local)
            pdf = pdf.copy()
            pdf["__rank"] = ranks
            yield pdf

    return srt.mapInPandas(assign, out_schema), n_classes


def suffix_array_ranks(df: DataFrame, text_col: str, id_col: str,
                       n_parts: int = 32) -> DataFrame:
    """Generalized SUFFIX ARRAY over the corpus by distributed prefix
    doubling (Manber–Myers re-expressed relationally; the structure
    Lee et al.'s ExactSubstr reference implementation builds
    natively): one row per suffix — ``(id, p, rank)`` where ``rank``
    is the 1-based DENSE lexicographic rank of the suffix
    ``text[p:]`` among ALL suffixes of ALL documents; equal ranks ⇔
    byte-identical suffixes (the repeated-content signal — a rank
    collision at any length IS a duplicated suffix, which is how a
    suffix array finds every repeated substring with no window
    length to choose).  Sorting by ``rank`` (ties by (id, p)) yields
    the suffix array itself.

    O(log maxlen) rounds; round k extends each suffix's sort key
    from 2^k to 2^(k+1) chars by pairing its rank with the rank of
    the suffix 2^k positions later IN THE SAME DOCUMENT — a per-doc
    ``lead`` window (distributed by doc), never a join.  The global
    re-ranking of the (rank, next_rank) pairs each round uses
    :func:`_global_dense_rank` — range-partition sort + two Arrow
    passes + a driver prefix-sum over ONE row per partition — so no
    step funnels the relation through a single task (the scalability
    ceiling of naive ``Window.orderBy`` ranking).  Stops at the
    fixed point: when a round refines NO rank class, equal ranks are
    equal full suffixes (the standard prefix-doubling argument), so
    cross-document identical suffixes terminate correctly as ties;
    ``localCheckpoint`` per round truncates the iterative lineage
    (the graph-operator idiom).

    This is the EXACT-path companion of
    :func:`repeated_substring_spans`: the window ops answer "what is
    duplicated at length >= L" in one shuffle; the suffix array costs
    O(log maxlen) distributed sorts and answers it for ALL lengths
    at once.  Differential-tested against brute-force sorted
    suffixes in tests/test_exact_substr.py.
    """
    sufs = _suffix_char_rows(df, text_col, id_col)
    n_total = sufs.count()
    if n_total == 0:
        return sufs.select("id", "p",
                           F.lit(0).cast("bigint").alias("rank"))
    # ranks-only: no snapshot retention — each round's blocks are
    # released as soon as the next round supersedes them
    cur, _snaps = _suffix_prefix_doubling(sufs, n_total, n_parts,
                                          keep_snaps=False)
    return cur.select("id", "p", F.col("r").cast("bigint")
                      .alias("rank"))


def _suffix_char_rows(df: DataFrame, text_col: str,
                      id_col: str) -> DataFrame:
    """One ``(id, p, __c)`` row per suffix: its start position and
    FIRST character (the h=1 sort key of prefix doubling)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    return (base.where(F.length("__t") > 0)
            .select("id", F.posexplode(F.expr(
                "split(__t, '(?!^)')")).alias("p", "__c"))
            # Spark's split keeps the trailing empty match — drop the
            # phantom empty suffix it would otherwise add per doc
            .where(F.col("__c") != ""))


def _suffix_prefix_doubling(sufs: DataFrame, n_total: int,
                            n_parts: int, keep_snaps: bool = True,
                            spill_dir: str | None = None):
    """The prefix-doubling loop of :func:`suffix_array_ranks`,
    returning BOTH the fixed-point ranks ``(id, p, r)`` and the
    per-round snapshots ``[(h, rank_h_df), ...]`` where ``rank_h``
    is the dense rank of every suffix by its first ``h`` characters
    (``rank_h`` equality ⇔ the length-``h`` prefixes, truncated at
    doc end, are byte-identical).  The snapshots are the classic
    sparse structure for O(log n) LCP queries — see
    :func:`suffix_lcp_array`.  The fixed-point test reads the class
    count straight off each round's driver prefix-sum
    (:func:`_global_dense_rank_counted`) — no countDistinct job.

    Snapshot pinning: ``localCheckpoint`` (heap/disk blocks) by
    default; with ``spill_dir`` set, each round writes
    ``{spill_dir}/rank_h{h}`` as parquet and reads it back — all
    O(log maxlen) generations live on DISK instead of the block
    store, which is the difference between fitting and OOMing on a
    multi-10M-suffix corpus (measured: the 16 GB heap that OOM'd
    retaining 13×20M-row snapshots runs the same corpus with room to
    spare spilled).  On a real cluster ``spill_dir`` is also the
    fault-tolerance story — localCheckpoint blocks die with their
    executor; parquet doesn't.  Caller owns the directory.  With
    ``keep_snaps=False`` (the ranks-only path) no generation is
    retained at all — superseded rounds are released as the Python
    references drop."""
    spark = sufs.sparkSession

    def _pin(ranked_df, h):
        if spill_dir is not None:
            path = f"{spill_dir}/rank_h{h}"
            ranked_df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        return ranked_df.localCheckpoint(eager=True)

    ranked, n_ranks = _global_dense_rank_counted(sufs, ["__c"], n_parts)
    cur = _pin(ranked.select("id", "p", F.col("__rank").alias("r")), 1)
    snaps = [(1, cur)]
    h = 1
    prev_n = -1
    while n_ranks < n_total and n_ranks != prev_n:
        prev_n = n_ranks
        # pair each suffix's rank with the rank h positions later in
        # the same doc — a hash-partitioned (id, p) self-join, NOT a
        # partitionBy(id) window: a window puts every suffix of a
        # document in ONE task, so a single giant document becomes
        # the round's straggler; the join spreads by (id, p)
        nxt = cur.select("id", (F.col("p") - h).alias("p"),
                         F.col("r").alias("__rn"))
        paired = (cur.join(nxt, ["id", "p"], "left")
                  .withColumn("__rn", F.coalesce(F.col("__rn"),
                                                 F.lit(-1))))
        ranked, n_ranks = _global_dense_rank_counted(
            paired, ["r", "__rn"], n_parts)
        h *= 2
        cur = _pin(ranked.select("id", "p", F.col("__rank").alias("r")),
                   h)
        if keep_snaps:
            snaps.append((h, cur))
        else:
            snaps = [(h, cur)]
    return cur, snaps


def _lcp_adjacent_pairs(pairs: DataFrame, snaps,
                        spill_dir: str | None = None) -> DataFrame:
    """LCP for pairs of NON-identical suffixes ``(a_id, a_p, a_slen,
    b_id, b_p, b_slen, ...)`` by greedy descent over the rank_h
    snapshots, largest h first: if ``rank_h`` matches at the current
    offset the next h characters are equal — advance by h; each power
    is needed at most once because a pair from two DISTINCT final
    rank classes has LCP < h_max (binary decomposition).  When ranks
    match but fewer than h characters remain, the truncated prefixes
    are byte-identical whole remainders — advance by the remainder
    (subsequent offsets fall past doc end and the left joins miss, so
    the value freezes).  Two equi-joins of the pair relation against
    the N-row snapshot per round, O(log maxlen) rounds — the texts
    themselves are never shipped, which is what makes this the
    100 TB shape (an LCP UDF over suffix strings would move
    O(corpus × suffix length) bytes)."""
    spark = pairs.sparkSession

    def _pin(df, h):
        if spill_dir is not None:
            path = f"{spill_dir}/lcp_pairs_h{h}"
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        return df.localCheckpoint(eager=True)

    cur = pairs.withColumn("lcp", F.lit(0).cast("bigint"))
    for h, snap in sorted(snaps, key=lambda t: -t[0]):
        ra = snap.select(F.col("id").alias("__aid"),
                         F.col("p").alias("__app"),
                         F.col("r").alias("__ra"))
        rb = snap.select(F.col("id").alias("__bid"),
                         F.col("p").alias("__bpp"),
                         F.col("r").alias("__rb"))
        cur = (cur
               .join(ra, (F.col("a_id") == F.col("__aid"))
                     & (F.col("a_p") + F.col("lcp") == F.col("__app")),
                     "left")
               .join(rb, (F.col("b_id") == F.col("__bid"))
                     & (F.col("b_p") + F.col("lcp") == F.col("__bpp")),
                     "left"))
        eq = (F.col("__ra").isNotNull() & F.col("__rb").isNotNull()
              & (F.col("__ra") == F.col("__rb")))
        rem = F.least(F.col("a_slen") - F.col("lcp"),
                      F.col("b_slen") - F.col("lcp"))
        cur = (cur.withColumn(
                   "lcp",
                   F.when(eq & (rem >= h), F.col("lcp") + h)
                    .when(eq, F.col("lcp") + rem)
                    .otherwise(F.col("lcp")))
               .drop("__aid", "__app", "__ra", "__bid", "__bpp", "__rb"))
        cur = _pin(cur, h)
    return cur


def suffix_lcp_array(df: DataFrame, text_col: str, id_col: str,
                     n_parts: int = 32,
                     spill_dir: str | None = None) -> DataFrame:
    """Distributed LCP array over the generalized suffix array: one
    row per RANK CLASS (byte-identical suffixes collapse — their
    pairwise LCP is trivially the full suffix) with the class's
    lexicographically-least representative, its size, and the
    longest common prefix with the NEXT class in suffix-array order
    — ``(rank, id, p, suffix_len, n_members, lcp_next)``,
    ``lcp_next`` null for the last class.  Because max-LCP over all
    suffix pairs is attained at an adjacent pair in sorted order,
    this relation answers every repeated-substring-length question
    exactly: a substring of length L repeats iff some class has
    ``lcp_next >= L`` or ``n_members >= 2`` with ``suffix_len >= L``.

    Built from the prefix-doubling snapshots (no extra sort): class
    representatives by one groupBy over the fixed-point ranks, then
    :func:`_lcp_adjacent_pairs` over the (class r, class r+1)
    equi-join.  Cost: the suffix array itself + O(log maxlen)
    pair-vs-snapshot joins.  Exact-path companion of the windowed
    ops (see :func:`suffix_array_ranks`)."""
    return _suffix_lcp_internal(df, text_col, id_col, n_parts,
                                spill_dir)[1]


def _suffix_lcp_internal(df: DataFrame, text_col: str, id_col: str,
                         n_parts: int, spill_dir: str | None = None):
    """Shared core of :func:`suffix_lcp_array` / :func:`suffix_maxrep`:
    returns ``(final_ranks_or_None, lcp_array_df)`` so per-suffix
    consumers can join class statistics back to every member without
    re-running the doubling."""
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    lens = base.select("id",
                       F.length("__t").cast("bigint").alias("__dlen"))
    sufs = _suffix_char_rows(df, text_col, id_col)
    n_total = sufs.count()
    empty_schema = ("rank bigint, id bigint, p int, suffix_len bigint,"
                    " n_members bigint, lcp_next bigint")
    if n_total == 0:
        return None, df.sparkSession.createDataFrame([], empty_schema)
    final, snaps = _suffix_prefix_doubling(sufs, n_total, n_parts,
                                           spill_dir=spill_dir)
    reps = (final.groupBy("r")
            .agg(F.min(F.struct("id", "p")).alias("s"),
                 F.count(F.lit(1)).alias("n_members"))
            .select(F.col("r"), F.col("s.id").alias("id"),
                    F.col("s.p").alias("p"), "n_members")
            .join(lens, "id")
            .withColumn("slen", F.col("__dlen") - F.col("p"))
            .drop("__dlen")
            .localCheckpoint(eager=True))
    nxt = reps.select((F.col("r") - 1).alias("__rprev"),
                      F.col("id").alias("b_id"),
                      F.col("p").alias("b_p"),
                      F.col("slen").alias("b_slen"))
    pairs = (reps.select("r", "n_members",
                         F.col("id").alias("a_id"),
                         F.col("p").alias("a_p"),
                         F.col("slen").alias("a_slen"))
             .join(nxt, F.col("r") == F.col("__rprev"), "inner")
             .drop("__rprev"))
    lcps = _lcp_adjacent_pairs(pairs, snaps, spill_dir).select(
        "r", F.col("lcp").alias("lcp_next"))
    arr = (reps.join(lcps, "r", "left")
           .select(F.col("r").cast("bigint").alias("rank"),
                   "id", "p",
                   F.col("slen").cast("bigint").alias("suffix_len"),
                   F.col("n_members").cast("bigint"),
                   F.col("lcp_next").cast("bigint")))
    return final, arr


def suffix_maxrep(df: DataFrame, text_col: str, id_col: str,
                  n_parts: int = 32,
                  spill_dir: str | None = None) -> DataFrame:
    """Per-suffix longest-repeated-prefix: one row ``(id, p, maxrep)``
    per suffix, ``maxrep`` = length of the longest substring STARTING
    at position p that occurs ≥2 times in the corpus (overlapping
    occurrences count; 0 when even the single character is unique).
    Standard LCP-array identity: any repeat starting at p is a common
    prefix of p's suffix and some other suffix, and max common prefix
    over all other suffixes is attained at a sorted-order neighbour —
    so per CLASS it is max(lcp with previous class, lcp with next
    class, full suffix_len when the class has ≥2 members), and every
    member of a class (byte-identical suffixes) shares the value.
    One R-row self-shift of the LCP array + one broadcast-able join
    back to the N-row rank relation — no new shuffle over the
    corpus."""
    final, arr = _suffix_lcp_internal(df, text_col, id_col, n_parts,
                                      spill_dir)
    if final is None:
        return df.sparkSession.createDataFrame(
            [], "id bigint, p int, maxrep bigint")
    prev = arr.select((F.col("rank") + 1).alias("rank"),
                      F.col("lcp_next").alias("__lcp_prev"))
    cls = (arr.join(prev, "rank", "left")
           .select(F.col("rank").alias("__r"),
                   F.greatest(
                       F.when(F.col("n_members") >= 2,
                              F.col("suffix_len")).otherwise(F.lit(0)),
                       F.coalesce(F.col("lcp_next"), F.lit(0)),
                       F.coalesce(F.col("__lcp_prev"), F.lit(0)))
                   .cast("bigint").alias("maxrep")))
    return (final.join(cls, final["r"] == cls["__r"])
            .select("id", "p", "maxrep"))


def repeated_substring_spans_sa(df: DataFrame, text_col: str,
                                id_col: str, min_len: int = 20,
                                n_parts: int = 32,
                                spill_dir: str | None = None
                                ) -> DataFrame:
    """:func:`repeated_substring_spans` coverage derived from the
    SUFFIX ARRAY instead of duplicated L-windows: identical maximal
    spans ``(id, start, length)`` for any ``min_len`` (cross-path
    parity asserted in tests/test_exact_substr.py), but the doubling
    cost is paid ONCE — each additional L is a filter over
    :func:`suffix_maxrep` plus a per-document interval union, with no
    new pass over the text.  Position p is covered iff some position
    q ≤ p has ``maxrep(q) ≥ max(min_len, p - q + 1)``; since every
    repeat starting at q is a prefix of the longest one, the union of
    ``[q, q + maxrep(q) - 1]`` over ``maxrep(q) ≥ min_len`` IS the
    any-length-≥L coverage.  Variable-width gaps-and-islands: a new
    island starts where ``start`` exceeds the running max ``end`` of
    all earlier intervals in the document plus one."""
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {L}")
    mr = (suffix_maxrep(df, text_col, id_col, n_parts, spill_dir)
          .where(F.col("maxrep") >= L))
    iv = mr.select("id", F.col("p").cast("bigint").alias("start"),
                   (F.col("p") + F.col("maxrep") - 1)
                   .cast("bigint").alias("end"))
    ordered = Window.partitionBy("id").orderBy("start")
    run_end = F.max("end").over(
        ordered.rowsBetween(Window.unboundedPreceding, -1))
    iv = (iv.withColumn(
              "__new", F.when(F.col("start")
                              > F.coalesce(run_end, F.lit(-2)) + 1,
                              1).otherwise(0))
          .withColumn("__span", F.sum("__new").over(
              ordered.rowsBetween(Window.unboundedPreceding, 0))))
    return (iv.groupBy("id", "__span")
            .agg(F.min("start").alias("start"),
                 (F.max("end") - F.min("start") + 1).alias("length"))
            .select("id", F.col("start").cast("bigint").alias("start"),
                    F.col("length").cast("bigint").alias("length")))


def longest_repeated_substring(df: DataFrame, text_col: str,
                               id_col: str, n_parts: int = 32,
                               spill_dir: str | None = None
                               ) -> DataFrame:
    """The longest substring occurring ≥2 times anywhere in the
    corpus (within one document or across documents), exactly — the
    all-lengths question no windowed pass can answer without knowing
    L up front.  Max over the LCP array of ``lcp_next`` (a repeat
    shared by two distinct suffix classes) and ``suffix_len`` of any
    class with ≥2 members (a duplicated whole suffix); ties broken
    by least (id, p) over the candidate class representatives.
    Returns one row ``(id, p, length, substring)`` locating one
    occurrence, or zero rows when no substring repeats.
    TakeOrdered(1) — no global sort."""
    arr = suffix_lcp_array(df, text_col, id_col, n_parts, spill_dir)
    cand = (arr.select(
                "id", "p",
                F.greatest(
                    F.when(F.col("n_members") >= 2,
                           F.col("suffix_len")).otherwise(F.lit(0)),
                    F.coalesce(F.col("lcp_next"), F.lit(0)))
                .alias("length"))
            .where(F.col("length") >= 1))
    best = cand.orderBy(F.col("length").desc(), "id", "p").limit(1)
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    return (best.join(base, "id")
            .select("id", "p", "length",
                    F.expr("substring(__t, p + 1, length)")
                    .alias("substring")))
