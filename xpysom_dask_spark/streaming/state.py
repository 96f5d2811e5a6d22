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
