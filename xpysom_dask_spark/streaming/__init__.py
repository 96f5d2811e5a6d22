"""Structured Streaming surface.

The reference (jcfaracco/xpysom-dask) is batch-only (SURVEY.md §2.6:
streaming absent); this package extends the engine to streams the
Spark-native way: the scoring family is stateless (``mapInArrow``) and
works unchanged on streaming DataFrames; training folds micro-batches
into the online SOM via ``foreachBatch``; windowed/watermarked
aggregates and ``applyInPandasWithState`` cover the stateful surface.
"""

from .decontam import (  # noqa: F401
    decontaminate_stream,
    eval_ngram_hashes,
)
from .dedup import dedup_stream  # noqa: F401
from .scoring import (  # noqa: F401
    classify_stream,
    score_stream,
    stream_zscore,
    windowed_activation_response,
    windowed_qe_drift,
    zscore_moments,
)
from .joins import interval_join_stream  # noqa: F401
from .sessions import session_windows  # noqa: F401
from .sources import (  # noqa: F401
    rate_micro_batch_stream,
    rate_stream,
)
from .sinks import (  # noqa: F401
    idempotent_parquet_sink,
    read_transactional,
    transactional_parquet_sink,
)
from .state import bmu_transitions  # noqa: F401
from .training import StreamingSomTrainer  # noqa: F401
from .sketches import (cms_stream, hist_stream, hll_stream,  # noqa: F401
                       ivf_drift_stream, psi_complete_spine,
                       psi_stream)
