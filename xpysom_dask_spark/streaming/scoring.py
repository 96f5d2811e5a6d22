"""Streaming SOM scoring + windowed roll-ups.

``score_stream`` is the streaming twin of ``SparkSom.transform``
(winner/predict/quantization, xpysom.py:370-417/608-645): the scoring
stage is a stateless narrow ``mapInArrow`` with the codebook broadcast,
so the exact same plan works under Structured Streaming — no
re-implementation, no state store.

The windowed roll-ups are the streaming twins of
``activation_response`` (xpysom.py:819-829 — hash aggregate of BMU
wins) and ``quantization_error`` (xpysom.py:673-707 — global mean of
the BMU residual), bucketed by event-time windows with a watermark for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.scoring import attach


def score_stream(som, stream_df: DataFrame,
                 outputs=("bmu_x", "bmu_y", "cluster_id")) -> DataFrame:
    """Append model columns to a streaming DataFrame (stateless, narrow).

    Identical semantics to ``SparkSom.transform`` — one Arrow pass per
    micro-batch, codebook broadcast once per query start.
    """
    return attach(som, stream_df, outputs)


def windowed_activation_response(som, stream_df: DataFrame, ts_col: str,
                                 window: str = "1 hour",
                                 slide: str | None = None,
                                 watermark: str = "1 hour") -> DataFrame:
    """Per-event-time-window activation response: how many rows each
    neuron wins per window.  Streaming twin of xpysom.py:819-829.

    Returns an *update/append-mode* aggregate: ``window_start,
    window_end, bmu_x, bmu_y, n_wins``.
    """
    scored = attach(som, stream_df.withWatermark(ts_col, watermark),
                    ("bmu_x", "bmu_y"))
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (scored.groupBy(win.alias("w"), "bmu_x", "bmu_y")
            .agg(F.count(F.lit(1)).alias("n_wins"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "bmu_x", "bmu_y", "n_wins"))


def windowed_qe_drift(som, stream_df: DataFrame, ts_col: str,
                      window: str = "1 hour",
                      watermark: str = "1 hour",
                      micro_decimals: int | None = None) -> DataFrame:
    """Mean quantization error per event-time window — a model-drift
    monitor: rising QE means the stream has moved away from the
    distribution the codebook was trained on (streaming twin of
    xpysom.py:673-707, bucketed by time instead of a global mean).

    ``micro_decimals=d`` switches the aggregation to deterministic
    mode: each qe is quantized to an integer at ``d`` decimals with
    the engine-portable ``floor(x·10ᵈ + 0.5)`` BEFORE summing, so the
    per-window sum is exact BIGINT arithmetic and the emitted mean is
    a bit-identical derived double under ANY partitioning, engine, or
    retry — float-mean drift monitors can differ in the last ulp
    between runs (summation order), which matters when the monitor's
    output feeds change detection or a correctness gate.
    """
    scored = attach(som, stream_df.withWatermark(ts_col, watermark), ("qe",))
    grouped = scored.groupBy(F.window(ts_col, window).alias("w"))
    if micro_decimals is None:
        agg = grouped.agg(F.avg("qe").alias("mean_qe"),
                          F.count(F.lit(1)).alias("n_rows"))
    else:
        scale = 10 ** int(micro_decimals)
        qmicro = F.floor(F.col("qe") * F.lit(float(scale)) + F.lit(0.5)) \
            .cast("bigint")
        agg = (scored.withColumn("__qm", qmicro)
               .groupBy(F.window(ts_col, window).alias("w"))
               .agg(F.sum("__qm").alias("__s"),
                    F.count(F.lit(1)).alias("n_rows"))
               .withColumn("mean_qe",
                           F.col("__s").cast("double") / F.col("n_rows")
                           / F.lit(float(scale))))
    return agg.select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      "mean_qe", "n_rows")


def zscore_moments(df: DataFrame, group_col: str, value_col: str,
                   decimals: int = 2) -> DataFrame:
    """Frozen per-group moments relation ``(grp, n, s_v, s_vv)`` for
    :func:`stream_zscore` — the exact-DECIMAL(38,0) sufficient
    statistics of :func:`~..operators.profile.zscore_by_group`,
    computed ONCE over a batch reference window (yesterday's events,
    the training corpus) and then joined against a live stream.
    |groups| tiny rows, one map-side-combinable aggregate."""
    s = 10 ** decimals
    vi = (f"CAST(ROUND(CAST({value_col} AS DOUBLE) * {s}, 0) "
          f"AS DECIMAL(38,0))")
    return (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    F.expr(vi).alias("vi"))
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("vi").alias("s_v"),
                 F.sum(F.expr("vi * vi")).alias("s_vv")))


def stream_zscore(stream_df: DataFrame, moments: DataFrame,
                  group_col: str, value_col: str,
                  decimals: int = 2,
                  threshold: float | None = None) -> DataFrame:
    """Score arriving rows against FROZEN reference moments — the
    online-anomaly serving pattern (alert on a payment 3σ off its
    event type's historical distribution, on arrival).

    Stateless: z is a pure codegen function of (row, static moments) —
    a stream-static broadcast join plus expressions, no watermark, no
    state store, no streaming aggregate — so the same plan works on a
    batch DataFrame, and a drained stream equals the batch result
    exactly (same z identity as ``zscore_by_group``: integer
    numerator/radicand, IEEE sqrt — bit-identical across engines).
    Refreshing the reference = recompute :func:`zscore_moments` at
    whatever cadence drift demands and restart the query."""
    s = 10 ** decimals
    vi = (f"CAST(ROUND(CAST({value_col} AS DOUBLE) * {s}, 0) "
          f"AS DECIMAL(38,0))")
    z = ("CAST(n * __vi - s_v AS DOUBLE) "
         "/ sqrt(nullif(CAST(n * s_vv - s_v * s_v AS DOUBLE), 0.0))")
    out = (stream_df.withColumn("__vi", F.expr(vi))
           .join(F.broadcast(moments),
                 F.col(group_col) == F.col("grp"))
           .withColumn("z", F.expr(z))
           .drop("grp", "n", "s_v", "s_vv", "__vi"))
    if threshold is not None:
        out = out.where(F.abs(F.col("z")) >= float(threshold))
    return out


def classify_stream(stream_df: DataFrame, text_col: str, id_col: str,
                    model: dict, out_col: str = "quality_p") -> DataFrame:
    """Live quality-classifier gate: score a document STREAM with a
    trained :func:`~..operators.models.logreg_fit_hashed` model — the
    front-door filter of a streaming ingest pipeline (score at
    arrival, route by threshold, feed the score distribution to
    ``psi_stream`` for drift alarms).

    The batch scorer is already the right streaming shape — one
    stateless narrow mapInPandas pass with the weights broadcast at
    query start — so this IS the batch plan under Structured
    Streaming: no state store, no watermark, drained output
    bit-identical to the batch twin (pinned by test)."""
    from ..operators.models import logreg_score_hashed

    return logreg_score_hashed(stream_df, text_col, id_col, model,
                               out_col)
