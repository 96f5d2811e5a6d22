"""Distributed linear probes: closed-form ridge regression over a
bounded feature set.

The quality-classifier step of a curation pipeline (FineWeb/DCLM-style:
score every document with a small supervised model over cheap features,
filter on the score) needs exactly one model family at 100 TB: a linear
probe whose TRAINING is a single map-side-combinable moments aggregate
— (XᵀX, Xᵀy) is d(d+3)/2 + 1 running sums, associative, O(d²) traffic
regardless of corpus size — and whose SCORING is a codegen'd dot
product (no UDF, no broadcast join, no shuffle).

Iterative trainers (SGD/L-BFGS) buy nothing here: for squared loss the
normal equations are exact, one pass, and deterministic up to float
summation order.  For classification-style labels in {0,1} this is the
least-squares probe (regularized LPM) — the standard cheap scorer when
the decision is "keep the top fraction", where only the ranking
matters.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: XᵀX is materialized driver-side: d² doubles.  64 features = 32 KB —
#: far above any curation feature set; the bound exists to catch a
#: caller accidentally passing an embedding column's components.
MAX_PROBE_FEATURES = 64


def ridge_fit(df: DataFrame, feature_cols: list[str], label_col: str,
              l2: float = 1e-6, decimals: dict | None = None) -> dict:
    """Closed-form ridge fit: returns ``{"cols": [...], "coef":
    ndarray(d), "intercept": float, "l2": λ, "n": rows}`` solving
    ``min ‖y − Xβ − b‖² + λ‖β‖²`` (intercept unpenalized, the sklearn
    convention, via centered moments).

    ONE aggregate job: Σx_i, Σx_i·x_j (upper triangle), Σx_i·y, Σy,
    Σy², n — map-side combinable, so shuffle traffic is O(d²) doubles
    total.  Driver work is an O(d³) solve on a d ≤ 64 system.

    ``decimals`` (col → fixed decimal places, must cover every feature
    and the label) switches the moment sums to EXACT integers in
    DECIMAL(38,0) — the repo's scaled-BIGINT idiom: double summation is
    accumulation-order-dependent, so without it the fitted coefficients
    drift in the last ulps under a different partition count; with it
    the fit is a pure function of the data (bit-identical under
    repartitioning, and — for d ≤ 2, where the solve is explicit
    Cramer — replayable by an external SQL engine).
    """
    d = len(feature_cols)
    if not 1 <= d <= MAX_PROBE_FEATURES:
        raise ValueError(
            f"ridge_fit: {d} features; must be 1..{MAX_PROBE_FEATURES} "
            "— for embedding-sized inputs use pca_project first or a "
            "proper GEMM path, not a per-column aggregate.")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    if decimals is not None:
        missing = [c for c in [*feature_cols, label_col]
                   if c not in decimals]
        if missing:
            raise ValueError(
                f"ridge_fit: decimals must cover every feature and the "
                f"label; missing {missing}")
        def _scaled(c):
            s = 10 ** decimals[c]
            return F.expr(f"CAST(ROUND(CAST({c} AS DOUBLE) * {s}, 0) "
                          f"AS DECIMAL(38,0))")
        x = [_scaled(c) for c in feature_cols]
        y = _scaled(label_col)
        fx = [float(10 ** decimals[c]) for c in feature_cols]
        fy = float(10 ** decimals[label_col])
    else:
        x = [F.col(c).cast("double") for c in feature_cols]
        y = F.col(label_col).cast("double")
        fx, fy = [1.0] * d, 1.0
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy")]
    for i in range(d):
        aggs.append(F.sum(x[i]).alias(f"sx{i}"))
        aggs.append(F.sum(x[i] * y).alias(f"sxy{i}"))
        for j in range(i, d):
            aggs.append(F.sum(x[i] * x[j]).alias(f"sxx{i}_{j}"))
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    row0 = df.where(cond).agg(*aggs).first()
    n = row0["n"]
    if not n:
        raise ValueError("ridge_fit: no rows with non-null features "
                         "and label")
    # un-scale the exact integer sums once, driver-side: sums of
    # scaled products divide by the product of the two scales
    row = {"n": n, "sy": float(row0["sy"]) / fy}
    for i in range(d):
        row[f"sx{i}"] = float(row0[f"sx{i}"]) / fx[i]
        row[f"sxy{i}"] = float(row0[f"sxy{i}"]) / (fx[i] * fy)
        for j in range(i, d):
            row[f"sxx{i}_{j}"] = float(row0[f"sxx{i}_{j}"]) \
                / (fx[i] * fx[j])
    sx = np.array([row[f"sx{i}"] for i in range(d)])
    sxy = np.array([row[f"sxy{i}"] for i in range(d)])
    xtx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"sxx{i}_{j}"]
    # centered system: Cov·β = cross-cov, intercept from the means
    mx = sx / n
    my = row["sy"] / n
    cov = xtx - np.outer(mx, sx)            # Σ(x−x̄)(x−x̄)ᵀ (via sums)
    cov = (cov + cov.T) / 2.0               # symmetrize float noise
    cross = sxy - mx * row["sy"]
    A = cov + l2 * np.eye(d)
    if d == 1:
        coef = np.array([cross[0] / A[0, 0]])
    elif d == 2:
        # explicit Cramer's rule: the exact double-op sequence an
        # external SQL engine can replay (np.linalg.solve pivots, so
        # its last-ulp results aren't reproducible outside LAPACK)
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        coef = np.array([
            (cross[0] * A[1, 1] - A[0, 1] * cross[1]) / det,
            (A[0, 0] * cross[1] - cross[0] * A[1, 0]) / det])
    else:
        coef = np.linalg.solve(A, cross)
    if d <= 2:
        # explicit scalar ops (np.dot's reduction order is BLAS's
        # choice) so the whole d ≤ 2 fit is SQL-replayable
        inter = my - sum(float(mx[i]) * float(coef[i])
                         for i in range(d))
    else:
        inter = float(my - mx @ coef)
    return {"cols": list(feature_cols), "coef": coef,
            "intercept": float(inter), "l2": float(l2),
            "n": int(n)}


def ridge_score(df: DataFrame, model: dict,
                out_col: str = "probe_score") -> DataFrame:
    """Append the probe's prediction — a pure codegen'd linear
    expression (whole-stage, no UDF, no broadcast, no shuffle): the
    shape that scores 100 TB at scan speed."""
    expr = F.lit(model["intercept"])
    for c, w in zip(model["cols"], model["coef"]):
        expr = expr + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, expr)


def probe_filter(df: DataFrame, model: dict, keep_fraction: float,
                 id_col: str, out_col: str = "probe_score") -> DataFrame:
    """Keep the top ``keep_fraction`` of rows by probe score — the
    FineWeb-style classifier gate.  The cutoff is ONE approximate
    quantile job (sketch aggregate, no sort); the filter is then a
    map-side predicate, so the corpus never shuffles.  Deterministic
    tie-handling: rows AT the cutoff keep, so the kept set is a pure
    function of (model, data)."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], "
                         f"got {keep_fraction}")
    scored = ridge_score(df, model, out_col)
    if keep_fraction == 1.0:
        return scored
    cut = scored.agg(F.percentile_approx(
        F.col(out_col), F.lit(1.0 - keep_fraction), F.lit(10000))
        .alias("c")).first()["c"]
    return scored.where(F.col(out_col) >= F.lit(float(cut)))
