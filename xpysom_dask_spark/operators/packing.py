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


def pack_bins_next_fit(df: DataFrame, id_col: str, token_col: str,
                       budget: int, n_groups: int = 32,
                       seed: int = 0) -> DataFrame:
    """NO-STRADDLE sequence packing (next-fit, id order): adds
    ``group`` (hash route), ``bin_id`` (global, ``group·2⁴⁰ + local``)
    and ``bin_fill`` (tokens in the bin after this doc) — a document
    never crosses a bin boundary: when it doesn't fit the open bin, a
    new bin starts.

    :func:`pack_sequences` is the PRETRAINING packer (concat-and-chunk;
    straddling is fine because the loss runs over a continuous token
    stream).  This is the SFT/finetuning packer: each example must
    stay whole inside one sequence, so the assignment is a true
    bin-packing.  Next-fit (not first-fit-decreasing) is deliberate:
    it preserves the deterministic id-order stream (curriculum- and
    replay-stable), is one sequential pass, and is SQL-replayable by a
    recursive CTE — the oracle replays every bin decision.  FFD packs
    ~10-20% tighter but reorders by size and needs global state; the
    waste is measured, not hidden: ``pack_stats`` applies unchanged
    (group on ``bin_id``).

    A document longer than ``budget`` gets a bin of its own (flagged
    ``oversize``) — the caller decides between truncation and drop.

    Scale shape: identical to :func:`pack_sequences` — hash-route to
    ``n_groups`` independent streams (one shuffle), then ONE ordered
    sequential pass per group inside Arrow (the recurrence "does it
    fit the open bin" is inherently sequential; parallelism comes from
    groups, the same contract as every per-key time-series op here).
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    ship_package(df.sparkSession)
    grp = F.floor(_unit_hash(id_col, seed) * n_groups).cast("bigint")
    slim = (df.withColumn("__grp", grp)
            .select(F.col(id_col).alias("id"),
                    F.col(token_col).cast("bigint").alias("n_tok"),
                    F.col("__grp").alias("group")))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        bins, fills, overs = [], [], []
        b, fill = 0, 0
        first = True
        for t in pdf["n_tok"]:
            t = int(t)
            if first:
                fill = t
                first = False
            elif fill + t <= budget:
                fill += t
            else:
                b += 1
                fill = t
            bins.append(b)
            fills.append(fill)
            overs.append(t > budget)
        out = pdf.copy()
        out["local_bin"] = bins
        out["bin_fill"] = fills
        out["oversize"] = overs
        return out

    packed = slim.groupBy("group").applyInPandas(
        kernel, "id bigint, n_tok bigint, group bigint, "
                "local_bin bigint, bin_fill bigint, oversize boolean")
    return (packed.withColumn(
        "bin_id", F.col("group") * F.lit(1 << 40) + F.col("local_bin"))
        .select(F.col("id").alias(id_col), "n_tok", "group",
                "bin_id", "bin_fill", "oversize"))


def pack_bins_ffd(df: DataFrame, id_col: str, token_col: str,
                  budget: int, n_groups: int = 32,
                  seed: int = 0) -> DataFrame:
    """First-fit-DECREASING no-straddle packing: the tighter classical
    bin packer (guaranteed ≤ 11/9·OPT + 1 bins) for when utilization
    beats stream order — batch SFT dataset builds where examples are
    shuffled downstream anyway.  Same output columns as
    :func:`pack_bins_next_fit`.

    Trade vs next-fit, explicitly: FFD reorders by size (id order is
    NOT preserved inside bins) and keeps every open bin as live state
    during the pass (O(bins-per-group) memory, still KBs), in exchange
    for typically 10-20% fewer bins.  Deterministic: sort key is
    (n_tok DESC, id), first-fit scans open bins in creation order.
    Not SQL-replayable in bounded recursion (first-fit needs the whole
    open-bin state per step), so correctness rides the local-replica
    and invariant tests rather than a DuckDB gate — the documented
    trade for the non-gated operator tier.

    Scale shape: identical to the next-fit packer — one hash-route
    shuffle, one sequential Arrow pass per group.
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    ship_package(df.sparkSession)
    grp = F.floor(_unit_hash(id_col, seed) * n_groups).cast("bigint")
    slim = (df.withColumn("__grp", grp)
            .select(F.col(id_col).alias("id"),
                    F.col(token_col).cast("bigint").alias("n_tok"),
                    F.col("__grp").alias("group")))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(__neg=-pdf["n_tok"]).sort_values(
            ["__neg", "id"]).drop(columns="__neg")
        fills = []                       # open-bin fills, creation order
        assign, after = [], []
        for t in pdf["n_tok"]:
            t = int(t)
            placed = None
            for bi, f0 in enumerate(fills):
                if f0 + t <= budget:
                    placed = bi
                    break
            if placed is None:
                fills.append(t)
                placed = len(fills) - 1
            else:
                fills[placed] += t
            assign.append(placed)
            after.append(fills[placed])
        out = pdf.copy()
        out["local_bin"] = assign
        out["bin_fill"] = after
        out["oversize"] = [int(t) > budget for t in pdf["n_tok"]]
        return out

    packed = slim.groupBy("group").applyInPandas(
        kernel, "id bigint, n_tok bigint, group bigint, "
                "local_bin bigint, bin_fill bigint, oversize boolean")
    return (packed.withColumn(
        "bin_id", F.col("group") * F.lit(1 << 40) + F.col("local_bin"))
        .select(F.col("id").alias(id_col), "n_tok", "group",
                "bin_id", "bin_fill", "oversize"))
