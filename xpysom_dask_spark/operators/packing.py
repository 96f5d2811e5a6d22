"""Token-budget sequence packing — concat-and-chunk assignment.

LLM pretraining consumes fixed-length token sequences: documents are
concatenated in a deterministic order and the stream is chunked every
``budget`` tokens.  The pipeline question is "which chunk does each
document start in?" — that assignment drives how documents are routed
to sequence builders.

Semantics here are exactly that concat-and-chunk: within a pack group,
documents are ordered by id, each document's start offset is the
running token total before it, and its pack is ``start_offset div
budget``.  A document longer than the remaining room in a chunk simply
straddles the boundary (as in real pretraining packing) — it is
*assigned* to the chunk where it starts.

Scale design: a single global ordering would serialize the cumulative
sum into one task, so documents are first routed to ``n_groups``
independent pack groups by content hash (deterministic, layout-
independent — same uniform as operators.sampling), and the cumulative
sum runs per group: one shuffle on ``group``, then an O(n_g log n_g)
window per group, all groups in parallel.  Packing quality is
unaffected — each group is its own token stream, chunked exactly.

Everything is window + arithmetic (no UDFs) with a bit-identical
DuckDB twin (__spark_entry__: pack_sequences oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _unit_hash


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, n_groups: int = 32,
                   seed: int = 0) -> DataFrame:
    """Assign every row to a pack: adds ``group`` (hash route),
    ``start_offset`` (tokens before this doc in its group stream) and
    ``pack_id`` (global: group * ceil-free composition, see below).

    ``pack_id`` is ``group * 2^40 + local_pack`` — globally unique,
    deterministic, and order-preserving within a group (2⁴⁰ chunks per
    group ≈ 10¹² tokens/group at budget 1k; raise n_groups long before
    that bound binds).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    grp = F.floor(_unit_hash(id_col, seed) * n_groups).cast("bigint")
    w = (Window.partitionBy("group").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (df.withColumn("group", grp)
           .withColumn("start_offset",
                       (F.sum(F.col(token_col)).over(w)
                        - F.col(token_col)).cast("bigint"))
           .withColumn("pack_id",
                       (F.col("group") * F.lit(1 << 40)
                        + F.floor(F.col("start_offset") / budget))
                       .cast("bigint")))
    return out


def pack_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """(pack_id, n_docs, n_tokens) — pack-fill audit, one map-side
    combinable aggregation."""
    return (packed.groupBy("pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_col).cast("bigint").alias("n_tokens")))
