"""Connected components over candidate-pair graphs.

Every near-duplicate pipeline ends the same way: pair generators
(operators.dedup / operators.similarity) emit verified (id_a, id_b)
edges, and the *consumer* needs duplicate CLUSTERS — "keep one document
per component" — not raw pairs.  This module closes that gap with a
DataFrame-native connected-components operator.

Algorithm: iterated min-label propagation.  Each round every node
adopts the minimum label in its closed neighborhood; rounds repeat
until no label changes.  Convergence takes O(graph diameter) rounds —
and duplicate graphs are near-clique clusters with tiny diameter (a
star component converges in 2 rounds), so the loop is a handful of
Spark jobs even at corpus scale.  Each round is one shuffle
(edges ⋈ labels on id, then min-agg on the neighbor side), both
map-side combinable; lineage is truncated every round with
``localCheckpoint`` so the plan never grows with the iteration count.
Driver traffic per round is ONE scalar (the changed-label count) — no
O(V) state ever leaves the executors.

For adversarial high-diameter graphs (long chains — not the dedup
shape), the classic fix is alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log² n); the label-propagation loop
here is the right trade for duplicate clusters and keeps every round
a single well-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; ``component``
    is the minimum id reachable through the pair graph — a canonical,
    deterministic cluster representative.

    Nodes not present in any pair are not emitted (callers treat absent
    ids as singleton components).
    """
    # symmetric edge list; (a,b) with a<b also contributes (b,a)
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (e.unionByName(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))

    # label(x) starts at x; first round folds in direct neighbors
    labels = (edges.groupBy("src")
              .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
              .withColumnRenamed("src", "id")
              .localCheckpoint(eager=True))

    for _ in range(max_iter):
        # candidate label via neighbors: min over label(neighbor)
        nbr = (edges.join(labels.withColumnRenamed("id", "dst"), "dst")
               .groupBy("src").agg(F.min("label").alias("nbr_label"))
               .withColumnRenamed("src", "id"))
        new_labels = (labels.join(nbr, "id", "left")
                      .select("id",
                              F.least("label", "nbr_label").alias("label"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter — raise it, or use a "
            "star-contraction algorithm for chain-shaped graphs)")
    return labels.select("id", F.col("label").alias("component"))


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_members) — one map-side-combinable aggregation."""
    return (components.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_members")))
