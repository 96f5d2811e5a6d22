"""PySpark-native batch Self-Organizing-Map engine + large-scale pipeline operators.

A from-scratch, Spark-first re-implementation of the capabilities of
jcfaracco/xpysom-dask (reference at /root/reference): batch-SOM training,
scoring and map-quality analytics over Spark DataFrames, plus the
deduplication / similarity-search / text-analysis / multimodal operators a
large training-data pipeline needs at 100 TB scale.

Architecture (SURVEY.md §7): dense numeric kernels are plain NumPy running
inside Arrow-vectorized ``mapInArrow`` stages with the codebook broadcast
per epoch; everything relational (counts, label maps, dedup, similarity
joins, windowed streams) is declarative DataFrame/SQL so Catalyst plans it.
"""

__version__ = "0.1.0"

from .operators.som import SparkSom
from .session import make_session

__all__ = ["SparkSom", "make_session"]
