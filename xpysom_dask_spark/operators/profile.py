"""Column-level data profiling — the ingest-audit pass every corpus
onboarding starts with: null counts, exact distinct cardinalities, and
numeric ranges per column, in ONE scan.

Shape: a single wide aggregate (Catalyst plans the multi-distinct via
an Expand — each input row fans to |cols| tagged rows, then one
partial-aggregated exchange), then a driver-side unpivot of the 1-row
result into the (column, metric…) report.  The unpivot touches one row,
so the report never collects data — only aggregates — regardless of
corpus size.  For 100 TB profiling where exact distincts are too hot,
``exact=False`` swaps in ``approx_count_distinct`` (HLL++, no Expand,
one ordinary aggregate) — the documented scale path; the exact mode is
the oracle configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str],
                    exact: bool = True) -> DataFrame:
    """Per-column profile: ``column, n_rows, n_nulls, n_distinct,
    min_val, max_val`` (min/max as DOUBLE — profile numeric columns;
    pass none and they come back NULL).

    One aggregate job; the result DataFrame is built driver-side from
    the single aggregate row (|cols| output rows — not a data scan).
    """
    distinct = (F.count_distinct if exact
                else (lambda c: F.approx_count_distinct(c)))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"__nulls_{c}"),
            distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [(c, row["__n"], row[f"__nulls_{c}"], row[f"__nd_{c}"],
            row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows bigint, n_nulls bigint, "
             "n_distinct bigint, min_val double, max_val double")
