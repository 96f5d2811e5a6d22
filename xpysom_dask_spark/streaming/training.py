"""Online SOM training over a stream via ``foreachBatch``.

The reference's batch algorithm (xpysom.py:458-594) folds the whole
dataset into (numerator, denominator) sums once per epoch.  The same
update is naturally *incremental*: each micro-batch contributes its own
(num, den) partials, merged into the codebook with the learning
rate/radius decayed by micro-batch index — classic online mini-batch
SOM.  ``foreachBatch`` gives each micro-batch to the existing batch
training plan (plans/training.py), so the distributed partial+final
aggregation, broadcastable codebook, and GEMM kernels are all reused.

When the source delivers everything in one micro-batch (e.g.
``availableNow`` over a small directory), the result is bit-identical
to one batch epoch — the differential test anchors on that.
"""

from __future__ import annotations

from ..plans.training import run_training


class StreamingSomTrainer:
    """Fold a streaming DataFrame of feature vectors into a SparkSom.

    Parameters
    ----------
    som : SparkSom
        Model to update in place (its decay schedule and kernels apply).
    horizon : int
        Decay horizon T: micro-batch t uses ``decay(v0, vN, min(t, T-1), T)``
        — the streaming analog of ``num_epochs``.  Batches beyond the
        horizon keep the final (smallest) learning rate/radius, so the
        model keeps adapting gently forever.
    epochs_per_batch : int
        Full passes over each micro-batch (default 1).
    """

    def __init__(self, som, horizon: int = 100, epochs_per_batch: int = 1):
        self.som = som
        self.horizon = int(horizon)
        self.epochs_per_batch = int(epochs_per_batch)
        self.batches_seen = 0

    def _process_batch(self, batch_df, batch_id) -> None:
        t = min(self.batches_seen, self.horizon - 1)
        for _ in range(self.epochs_per_batch):
            run_training(self.som, batch_df, self.horizon,
                         iter_beg=t, iter_end=t + 1)
        self.batches_seen += 1

    def attach(self, stream_df, checkpoint_dir: str | None = None,
               trigger: dict | None = None, query_name: str = "som_train"):
        """Start the training query; returns the ``StreamingQuery``.

        ``trigger`` is passed through to ``DataStreamWriter.trigger``
        (e.g. ``{"availableNow": True}`` to drain a directory and stop,
        or ``{"processingTime": "10 seconds"}``).
        """
        feats = stream_df.select(stream_df[self.som.features_col]
                                 .alias(self.som.features_col))
        writer = (feats.writeStream
                  .queryName(query_name)
                  .outputMode("update")
                  .foreachBatch(self._process_batch))
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()

    def fit_available(self, stream_df, checkpoint_dir: str | None = None,
                      timeout: int | None = None):
        """Drain everything currently available, then return the som."""
        q = self.attach(stream_df, checkpoint_dir,
                        trigger={"availableNow": True})
        q.awaitTermination(timeout)
        return self.som
