"""Embedding-column utilities: storage quantization, normalization,
and per-label geometry reports.

At 100 TB the embedding column dominates storage: a 64-dim float32
vector is 256 bytes/row, and a 1e11-row corpus carries ~25 TB of
vectors alone.  Symmetric int8 quantization cuts that 4× (64 bytes +
one float scale) at ~0.4 % max reconstruction error for unit-scale
data — the standard serving-side trade (FAISS `SQ8`, ScaNN's
fixed-point leaf format).  Everything here is pure JVM expression
work: `transform`/`aggregate` higher-order functions inside
whole-stage codegen, no shuffle, no Python, so the quantize/normalize
passes run at scan speed and compose with column pruning.

The per-label centroid report IS a shuffle (groupBy label), but a
cheap one: partial aggregation reduces each partition to
|labels| × dim doubles before the exchange, so network traffic is
O(partitions · labels · dim) regardless of row count — the same
partial-agg shape as the SOM training epoch (plans/training.py).

No reference counterpart (xpysom-dask has no embedding-storage ops);
these are the beyond-reference pipeline surface required for
large-scale training-data work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_expr


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  scale_col: str = "scale",
                  out_col: str = "qvec") -> DataFrame:
    """Per-row symmetric int8 quantization of ``vec_col``.

    scale = max(|v|) / 127 (1.0 for the all-zero vector), and
    q[k] = floor(v[k]/scale + 0.5) — i.e. round-half-up, spelled as
    ``floor(x + 0.5)`` because that exact form is engine-portable
    (Spark ROUND is HALF_UP, DuckDB's rounds half away from zero;
    floor(+0.5) is the same primitive everywhere).  |q| ≤ 127 by
    construction, so the tinyint range is never clipped.

    One narrow projection — the whole thing is codegen'd array math
    in the scan stage.
    """
    amax = F.array_max(F.transform(
        F.col(vec_col), lambda v: F.abs(v.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    out = df.withColumn(scale_col, scale)
    q = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") / F.col(scale_col) + F.lit(0.5))
        .cast("tinyint"))
    return out.withColumn(out_col, q)


def dequantize_int8(df: DataFrame, qvec_col: str = "qvec",
                    scale_col: str = "scale",
                    out_col: str = "vec") -> DataFrame:
    """Inverse of :func:`quantize_int8`: v̂[k] = q[k] · scale (double)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(qvec_col),
                    lambda q: q.cast("double") * F.col(scale_col)))


def quantization_error(df: DataFrame, vec_col: str = "embedding",
                       qvec_col: str = "qvec",
                       scale_col: str = "scale",
                       out_col: str = "max_abs_err") -> DataFrame:
    """Per-row max |dequantized − original| — the reconstruction-error
    column that makes the 4× storage trade auditable (bounded by
    scale/2 = max|v|/254 by the rounding rule)."""
    err = F.array_max(F.zip_with(
        F.col(qvec_col), F.col(vec_col),
        lambda q, v: F.abs(q.cast("double") * F.col(scale_col)
                           - v.cast("double"))))
    return df.withColumn(out_col, err)


def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = "unit_vec") -> DataFrame:
    """L2-normalize ``vec_col`` (double output); zero vectors pass
    through unchanged.  Normalizing once at ingest turns every
    downstream cosine into a plain dot product — at 100 TB that
    halves the FLOPs of every similarity pass over the corpus."""
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col),
                    lambda v: v.cast("double") * v.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    unit = F.when(
        nrm > 0,
        F.transform(F.col(vec_col), lambda v: v.cast("double") / nrm)
    ).otherwise(F.transform(F.col(vec_col), lambda v: v.cast("double")))
    return df.withColumn(out_col, unit)


def label_centroids(df: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label", dim: int = 64,
                    decimals: int = 6) -> DataFrame:
    """Per-label centroid geometry: member count, centroid L2 norm, and
    mean cosine of members to their centroid — the class-compactness
    report used to sanity-check embedding spaces (collapsed classes →
    avg_cos ≈ 1; scrambled labels → avg_cos ≈ 0 for mean-centered
    spaces).

    Plan: posexplode → partial-aggregated groupBy(label, pos) (traffic
    O(partitions · labels · dim), not O(rows)) → centroids collected to
    a |labels|-row broadcast side → broadcast join back for the member
    cosine pass → final groupBy(label).  Two shuffles total, both on
    the low-cardinality label key; centroid components are rounded to
    ``decimals`` BEFORE the cosine so the report is reproducible across
    engines and partitionings (sum-order float drift is absorbed by the
    rounding, same trick as the training-update oracle).
    """
    pos = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"))
    cent = (pos.groupBy("label", "pos")
            .agg(F.round(F.sum(F.col("val").cast("double"))
                         / F.count("*"), decimals).alias("c"))
            .groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c")).alias("centroid")))
    members = df.select(F.col(label_col).alias("label"),
                        F.col(vec_col).alias("v"))
    joined = members.join(F.broadcast(cent), "label")
    cos = F.expr(cosine_expr("v", "centroid"))
    return (joined.groupBy("label")
            .agg(F.count("*").alias("n_members"),
                 F.round(F.first(F.expr(
                     "sqrt(aggregate(transform(centroid, c -> c * c), "
                     "0D, (acc, v) -> acc + v))")), decimals)
                 .alias("centroid_norm"),
                 F.round(F.sum(cos) / F.count("*"), decimals)
                 .alias("avg_cos")))
