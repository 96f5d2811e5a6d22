"""Pure-NumPy numeric kernels (distances, neighborhoods, decays) and
Spark SQL column expression builders (text analytics).

The NumPy kernels run executor-side inside Arrow-vectorized UDF stages;
they are fully unit-testable without a SparkSession.
"""

from .distances import resolve_distance, DISTANCE_NAMES
from .neighborhoods import make_neighborhood, neighborhood_names
from .decays import resolve_decay, DECAY_NAMES

__all__ = [
    "resolve_distance",
    "DISTANCE_NAMES",
    "make_neighborhood",
    "neighborhood_names",
    "resolve_decay",
    "DECAY_NAMES",
]
