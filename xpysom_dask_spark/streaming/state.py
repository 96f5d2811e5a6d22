"""Custom stateful streaming operator: per-key BMU trajectory tracking.

``applyInPandasWithState`` home for semantics Spark's built-in windowed
aggregates can't express: for each key (user, device, ...) remember the
*last* SOM cell its events mapped to and count cell *transitions* —
"how often does this entity move between clusters" is a standard
behavioral-drift signal over a trained SOM.  No reference counterpart
(the reference is batch-only); this is the engine's demonstration of
arbitrary stateful processing done the Structured Streaming way.

Output (update mode), one row per key per micro-batch in which the key
appeared: ``key, n_events, n_transitions, last_cluster``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from ..plans.scoring import attach

_STATE_SCHEMA = "n_events bigint, n_transitions bigint, last_cluster bigint"


def _transition_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
    n_events, n_transitions, last = (
        state.get if state.exists else (0, 0, -1))
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        # event-time order within the batch
        pdf = pdf.sort_values("__ts__") if "__ts__" in pdf.columns else pdf
        # vectorized transition count: internal boundaries via
        # shift-compare, plus the carried boundary against the previous
        # batch/state (last == -1 means "no prior event" — the first
        # event never counts as a transition)
        cid = pdf["cluster_id"].to_numpy(np.int64)
        n_transitions += int((cid[1:] != cid[:-1]).sum())
        if last != -1 and cid[0] != last:
            n_transitions += 1
        last = int(cid[-1])
        n_events += len(cid)
    state.update((n_events, n_transitions, last))
    yield pd.DataFrame({
        "key": [key[0]],
        "n_events": [n_events],
        "n_transitions": [n_transitions],
        "last_cluster": [last],
    })


def bmu_transitions(som, stream_df, key_col: str, ts_col: str | None = None,
                    watermark: str = "1 hour"):
    """Score the stream, then track per-key cluster transitions.

    Grouping on ``key_col`` shuffles once on the key (hash partitioning
    co-locates each key's state with its rows — the scale-out property);
    scoring stays in the narrow pre-shuffle stage.
    """
    from ..plans.exchange import ship_package

    ship_package(stream_df.sparkSession)
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the output key column carries whatever type key_col has (string
    # user ids, ints, ...) — hardcoding bigint would miscoerce or fail
    key_t = stream_df.schema[key_col].dataType.simpleString()
    scored = attach(som, stream_df, ("cluster_id",))
    cols = [scored[key_col].alias("key"), "cluster_id"]
    if ts_col is not None:
        scored = scored.withWatermark(ts_col, watermark)
        cols.append(scored[ts_col].alias("__ts__"))
    slim = scored.select(*cols)
    return slim.groupBy("key").applyInPandasWithState(
        _transition_fn,
        outputStructType=f"key {key_t}, " + _STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ewma_fn_factory(w: list, lag: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        hist = list(state.get[0]) if state.exists else []
        ids, keys, vals, ewmas = [], [], [], []
        # applyInPandasWithState may deliver a key's micro-batch as
        # MULTIPLE Arrow chunks whose relative order is not event-time
        # sorted (>maxRecordsPerBatch rows, multi-file batches);
        # per-chunk sorting would silently break the "drained stream
        # equals batch ewma exactly" contract.  Concatenate the whole
        # key-micro-batch first, sort ONCE, then fold — memory stays
        # bounded by the micro-batch (state itself is O(lag)).
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1
                   else pd.concat(chunks, ignore_index=True))
            pdf = pdf.sort_values(["__ts__", "id"])
            for _id, v in zip(pdf["id"].to_numpy(np.int64),
                              pdf["value"].to_numpy(np.float64)):
                hist.append(float(v))
                if len(hist) > lag:
                    hist = hist[-lag:]
                m = len(hist)
                num = 0.0
                for p in range(m):          # strict left fold — the
                    num += hist[p] * w[m - 1 - p]   # batch op's order
                den = 0.0
                for p in range(m):
                    den += w[p]
                x = num / den
                # round half away from zero at 1e-6, matching the
                # batch operator's F.round on the same double
                r = (1.0 if x >= 0 else -1.0) * (
                    int(abs(x) * 1e6 + 0.5) / 1e6)
                ids.append(int(_id))
                keys.append(key[0])
                vals.append(float(v))
                ewmas.append(r)
        state.update((hist[-(lag - 1):] if lag > 1 else [],))
        yield pd.DataFrame({"id": ids, "key": keys, "value": vals,
                            "ewma": ewmas})
    return fn


def ewma_stream(stream_df, key_col: str, value_col: str, ts_col: str,
                id_col: str, alpha: float = 0.25, lag: int = 16):
    """Streaming twin of :func:`~..operators.profile.ewma`: per-key
    truncated EWMA maintained ACROSS micro-batches — the keyed state
    carries the trailing ``lag−1`` observations, so draining an
    event-time-ordered stream (any batch slicing) emits exactly what
    the batch operator computes on the union.  That cross-batch
    equality IS the contract, pinned by the parity test.

    Per-key per-event sequential math is inherent to the recurrence
    (each output depends on the previous ``lag−1`` inputs), so the
    kernel is an ordered Python loop over the batch — the state
    operator is the INGEST-scale path (bounded by arrival rate, state
    O(lag) doubles per key); the windowed batch operator is the
    backfill-scale path.  Output (update mode): one row per event —
    ``id, key, value, ewma``.

    Rows must arrive in event-time order across batches for exact
    parity (a file-source replay or a watermarked upstream sort);
    within a batch the kernel orders by (ts, id) itself.
    """
    from ..plans.exchange import ship_package

    ship_package(stream_df.sparkSession)
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.profile import ewma_weights

    w = ewma_weights(alpha, lag)
    key_t = stream_df.schema[key_col].dataType.simpleString()
    # NULL ts would enter the kernel and pandas sorts NaN last,
    # silently breaking drained-stream == batch parity: mirror the
    # batch operator's (value AND ts) NOT NULL filter exactly
    slim = (stream_df.where(F.col(value_col).isNotNull()
                            & F.col(ts_col).isNotNull())
            .select(F.col(key_col).alias("key"),
                    F.col(id_col).alias("id"),
                    F.col(value_col).cast("double").alias("value"),
                    F.col(ts_col).alias("__ts__")))
    return slim.groupBy("key").applyInPandasWithState(
        _ewma_fn_factory(w, int(lag)),
        outputStructType=(f"id bigint, key {key_t}, value double, "
                          "ewma double"),
        stateStructType="vals array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
