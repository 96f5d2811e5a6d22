"""Event-stream relational operators (sessionization & friends).

No reference counterpart (SURVEY.md §2.6 — the reference has no
window/sort/time surface at all); these are the standard event-pipeline
shapes, expressed as pure window functions so Catalyst plans one shuffle
on the partition key and sorts within partitions — the shape that holds
at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    to their previous event exceeds ``gap_s`` seconds.

    ``ts_col`` is BIGINT epoch-nanoseconds (the events table contract).
    Returns one row per (user, session): ``user_id, session_id`` (1-based
    per user in time order), ``n_events, start_s, end_s, duration_s``.

    Physical shape: one hash shuffle on ``user_col``, two window passes
    (lag + running sum) over the same partitioning — the second window
    reuses the first's sort, then a hash aggregate on (user, session).
    """
    gap_ns = int(gap_s) * 1_000_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap_ns), 1).otherwise(0)
    sess = (events
            .withColumn("_new", new_session)
            .withColumn("session_id", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    # integer DIV, not float division: epoch-nanos (~1.7e18) exceed
    # double's exact-integer range, so a float path can round the second
    return (sess.groupBy(user_col, "session_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.expr(f"CAST(min({ts_col}) DIV 1000000000 AS BIGINT)")
                 .alias("start_s"),
                 F.expr(f"CAST(max({ts_col}) DIV 1000000000 AS BIGINT)")
                 .alias("end_s"))
            .withColumn("duration_s",
                        (F.col("end_s") - F.col("start_s")).cast("bigint")))


def asof_join(left: DataFrame, right: DataFrame, key_cols,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols=None, direction: str = "backward",
              tolerance=None, suffix: str = "_asof",
              tie_break: str | None = None) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, attach the
    columns of the LATEST right row at-or-before its timestamp
    (``direction="backward"``; ``"forward"`` takes the earliest
    at-or-after).  The feature-store primitive — "what was the user's
    last known X when this event happened" — with no lookahead leakage.

    Spark has no asof join operator; the scalable formulation is the
    union-and-window trick, NOT a range join (a range-condition join
    degenerates to per-key cross products):

      1. union both sides on the key with a side tag (right sorts
         before left at equal timestamps, so equal-ts matches are
         visible to the left row);
      2. ONE window over (key, ts, tag[, tie_break]) carries the right
         row — packed as a single struct, so the match is row-atomic —
         forward with ``last(..., ignorenulls)``;
      3. keep left rows; optionally null out matches older than
         ``tolerance`` (same unit as the ts columns).

    One hash Exchange on the key + one sort — the sessionize shape; no
    join node at all, so there is nothing to degenerate at scale.

    Ties inside the right side (same key, same ts): by default they
    resolve to the row latest in the union sort order, which is
    partition-order dependent.  Pass ``tie_break`` (a right-side column
    name) to make equal-timestamp matches deterministic — the column
    joins the window sort as a secondary key, so the right row with the
    MAX tie-break value wins (last-wins in both directions), stable
    across runs, shuffles, and engines.  Same plan shape either way:
    the extra key rides the existing sort, no new exchange.

    Output: every left column, plus each right value column as
    ``<name><suffix>`` and the matched timestamp as ``ts<suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, "
                         f"got {direction!r}")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in set(key_cols) | {right_ts}]
    if tie_break is not None and tie_break not in right.columns:
        raise ValueError(f"tie_break column {tie_break!r} not in right "
                         f"side columns {right.columns}")

    from pyspark.sql.types import StructField, StructType

    # the right row rides the union as ONE struct, so the carried match
    # is row-atomic (a NULL in the winning row's value column stays
    # NULL instead of falling back to an older row's value — the DuckDB
    # ASOF semantics), and the window computes one last() instead of
    # one per value column
    r_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
        + [StructField("__rts", right.schema[right_ts].dataType)])
    tb_cols = [] if tie_break is None else [tie_break]
    lcols = [c for c in left.columns]
    l = (left.withColumn("__tag", F.lit(1))
         .withColumn("__ts", F.col(left_ts))
         .select(*key_cols, "__tag", "__ts",
                 *[F.col(c) for c in lcols if c not in key_cols],
                 F.lit(None).cast(r_struct_t).alias("__r"),
                 *[F.lit(None).cast(right.schema[c].dataType)
                   .alias("__tb") for c in tb_cols]))
    r = (right.withColumn("__tag", F.lit(0))
         .withColumn("__ts", F.col(right_ts))
         .select(*key_cols, "__tag", "__ts",
                 *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   for c in lcols if c not in key_cols],
                 F.struct(*[F.col(c).alias(c) for c in right_cols],
                          F.col(right_ts).alias("__rts")).alias("__r"),
                 *[F.col(c).alias("__tb") for c in tb_cols]))
    u = l.unionByName(r)

    asc = direction == "backward"
    order = [F.col("__ts").asc() if asc else F.col("__ts").desc(),
             F.col("__tag").asc()]
    if tie_break is not None:
        # among equal-(ts, tag=0) right rows, max tie-break sorts last
        # and is what last(ignorenulls) carries — deterministic winner;
        # left rows carry NULL, which sorts first and never outranks
        order.append(F.col("__tb").asc_nulls_first())
    w = (Window.partitionBy(*key_cols).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("__c", F.last("__r", ignorenulls=True).over(w))

    out = carried.where(F.col("__tag") == 1)
    matched = F.col("__c").isNotNull()
    cts = F.col("__c.__rts")
    if tolerance is not None:
        gap = (F.col("__ts") - cts if asc else cts - F.col("__ts"))
        matched = matched & (gap <= tolerance)
    sel = [F.col(c) for c in key_cols]
    sel += [F.col(c) for c in lcols if c not in key_cols]
    sel += [F.when(matched, F.col(f"__c.{c}")).alias(f"{c}{suffix}")
            for c in right_cols]
    sel += [F.when(matched, cts).alias(f"ts{suffix}")]
    return out.select(*sel)


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", start_col: str = "start",
                  end_col: str = "end", key_cols=(),
                  bucket_width: int | None = None) -> DataFrame:
    """Range join: every (point, interval) pair with
    ``start ≤ ts ≤ end`` (and equal ``key_cols``), WITHOUT the
    nested-loop degeneration.

    Spark plans a raw range predicate as BroadcastNestedLoopJoin (or a
    per-key cross product when only the equi-keys match) — quadratic at
    scale.  The scalable shape maps both sides onto fixed-width time
    buckets: a point lives in exactly one bucket, an interval explodes
    to the buckets it overlaps (fan-out ``len/width + 1``), the join is
    a plain equi-join on (keys…, bucket), and exact containment filters
    the candidates.  Each matching pair meets in exactly the point's
    bucket, so no dedup stage is needed.

    ``bucket_width`` (same unit as the ts columns) trades interval
    fan-out against candidate density: pick ≈ the typical interval
    length (p50–p99) so most intervals explode to ≤ 2 buckets.  It is
    required — a default would hide the one knob that decides the
    plan's scale behavior.
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError(
            "interval_join requires a positive bucket_width (same unit "
            "as the timestamp columns); choose roughly the typical "
            "interval length so intervals explode to a couple buckets.")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)

    p = points.withColumn(
        "__bucket", F.expr(f"CAST({point_ts} DIV {int(bucket_width)} "
                           "AS BIGINT)"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.expr(
            f"sequence(CAST({start_col} DIV {int(bucket_width)} AS "
            f"BIGINT), CAST({end_col} DIV {int(bucket_width)} AS "
            f"BIGINT))")))
    joined = p.join(iv, key_cols + ["__bucket"])
    return (joined
            .where((F.col(point_ts) >= F.col(start_col))
                   & (F.col(point_ts) <= F.col(end_col)))
            .drop("__bucket"))


def parse_props(events: DataFrame, field: str, out_col: str | None = None,
                props_col: str = "props",
                cast: str = "bigint") -> DataFrame:
    """Extract one field from the JSON ``props_col`` as a typed column.

    Semi-structured event payloads are the norm in clickstream corpora;
    the scale-correct pattern is `get_json_object` (JVM-side Jackson
    path evaluation, whole-stage codegen, no Python) projected ONCE
    into a typed column, after which every downstream filter/agg runs
    on the typed value and the JSON string can be pruned from the scan.
    For many-field extraction prefer `from_json` with an explicit
    schema (one parse, N fields) — this helper is the single-field
    fast path.
    """
    out_col = out_col or field
    return events.withColumn(
        out_col,
        F.get_json_object(F.col(props_col), f"$.{field}").cast(cast))


def props_field_stats(events: DataFrame, field: str = "k",
                      group_col: str = "event_type",
                      props_col: str = "props") -> DataFrame:
    """Per-group stats of a numeric JSON props field: count, missing
    count, exact integer sum, and min/max/avg — the profiling query
    every semi-structured ingest starts with.

    One narrow JSON projection + one partial-aggregated groupBy on the
    low-cardinality group key; the sum is exact BIGINT arithmetic so
    the report is bit-stable across partitionings and engines (the avg
    is derived sum/count in double — one deterministic division).
    """
    k = F.get_json_object(F.col(props_col), f"$.{field}").cast("bigint")
    return (events.withColumn("__k", k)
            .groupBy(F.col(group_col).alias("group_key"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_missing"),
                 F.sum("__k").alias("sum_val"),
                 F.min("__k").alias("min_val"),
                 F.max("__k").alias("max_val"),
                 F.round(F.sum("__k").cast("double") / F.count(F.lit(1)), 6)
                 .alias("avg_val")))


def rollup_report(events: DataFrame, ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """Hierarchical ROLLUP aggregate: (event_type, hour-of-day) →
    (event_type) → grand total, one row each, with ``grouping_id``
    tagging the level — the OLAP cube slice a monitoring dashboard
    reads in one query instead of three.

    Catalyst plans ROLLUP as one Expand (each row fans to its 3
    grouping sets) + one partial-aggregated exchange — a single
    shuffle whose traffic is O(groups), not O(rows).  Hour-of-day is
    exact BIGINT arithmetic on the epoch-nano timestamp (DIV 3600e9
    mod 24), so the report is engine- and layout-stable.
    """
    hour = F.expr(f"CAST(({ts_col} DIV 3600000000000) % 24 AS BIGINT)")
    rolled = (events.withColumn("hour_of_day", hour)
              .rollup(type_col, "hour_of_day")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum(value_col), 4).alias("sum_value"),
                   F.grouping_id().cast("bigint").alias("level")))
    # grouped-out keys come back NULL from ROLLUP; surface them as
    # explicit sentinels so consumers (and sort-based comparators)
    # never mix NULL into a key column
    return rolled.select(
        F.coalesce(F.col(type_col), F.lit("ALL")).alias(type_col),
        F.coalesce(F.col("hour_of_day"), F.lit(-1).cast("bigint"))
        .alias("hour_of_day"),
        "n_events", "sum_value", "level")


def moving_average(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   id_col: str = "event_id", n: int = 5,
                   decimals: int = 6) -> DataFrame:
    """Per-user trailing moving average over the last ``n`` events:
    ``event_id, user_id, ma`` — the rolling-feature primitive for
    per-entity time series.

    One hash Exchange on the user key + one window pass (sort reused
    for any sibling window on the same partitioning).  Ordering is on
    the µs-truncated timestamp with an explicit ``id_col`` tie-break:
    sub-µs ordering is not portable across engines/readers (parquet
    NANOS truncate to µs in µs-precision readers), so the operator
    never depends on it.
    """
    us = F.expr(f"CAST({ts_col} DIV 1000 AS BIGINT)")
    w = (Window.partitionBy(user_col)
         .orderBy(us.asc(), F.col(id_col).asc())
         .rowsBetween(-(n - 1), 0))
    return events.select(
        F.col(id_col), F.col(user_col),
        F.round(F.avg(F.col(value_col)).over(w), decimals).alias("ma"))


def pivot_counts(events: DataFrame, row_col: str, pivot_col: str,
                 pivot_values: list[str]) -> DataFrame:
    """Pivot ``pivot_col`` into one count column per value in
    ``pivot_values`` (explicit value list — Spark then skips the extra
    distinct-values job AND the output schema is deterministic, which
    an implicit pivot is not).  Physically identical to conditional
    aggregation: one partial-aggregated shuffle on ``row_col``,
    O(rows_out · values) result."""
    return (events.groupBy(row_col)
            .pivot(pivot_col, pivot_values)
            .agg(F.count(F.lit(1)))
            .select(F.col(row_col),
                    *[F.coalesce(F.col(v), F.lit(0)).cast("bigint")
                      .alias(f"n_{v}") for v in pivot_values]))


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel analysis: ``step, step_name, n_users`` — how many
    users completed step k, where completing step k means an event of
    type ``steps[k]`` AT OR AFTER the user's completion time of step
    k−1 (the classic strictly-sequenced conversion funnel; completion
    time of a step is the EARLIEST qualifying event, which maximizes
    downstream conversions).

    Plan (single-pass, VERDICT r03 #3): ONE filtered scan of events →
    one map-side-combined shuffle on ``user_col`` collecting each
    user's funnel-type events as a sorted ``(ts, type)`` array → a
    codegen'd fold that walks the array advancing a (step, threshold)
    state — the ClickHouse ``windowFunnel`` shape.  All k step counts
    come out of one conditional aggregate over the per-user "steps
    reached" number, so the whole funnel is one Spark job and one
    shuffle regardless of k (the old join-chain ran k actions, each
    re-executing its predecessors: O(k²) scans).

    Exactness: the fold is applied ``len(steps)`` times (fixpoint
    unroll).  A single in-order pass already matches the chained
    ``MIN(ts) ... ts >= prev`` semantics for distinct step types; the
    re-passes make timestamp TIES and repeated step types exact too
    (an event at exactly the previous step's completion time qualifies
    — ``>=`` — even when it sorts before the completing event).

    Per-user memory is O(that user's funnel-type events); at 100 TB a
    bot user with millions of matching events concentrates in one
    task, so pre-filter such users (or cap with a sampled quota) —
    whereas shuffle TRAFFIC here is the same one-pass O(events) the
    join chain paid per step.
    """
    n = len(steps)
    if n < 1:
        raise ValueError("steps must be non-empty")
    steps_lit = F.array(*[F.lit(s) for s in steps])

    per_user = (events.where(F.col(type_col).isin(list(set(steps))))
                .groupBy(user_col)
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(type_col).alias("s")))).alias("__evs")))

    def _advance(acc, e):
        can = ((acc["c"] < F.lit(n))
               & (e["s"] == F.element_at(steps_lit, acc["c"] + 1))
               & (e["t"] >= acc["tc"]))
        return F.struct(
            F.when(can, acc["c"] + 1).otherwise(acc["c"]).alias("c"),
            F.when(can, e["t"]).otherwise(acc["tc"]).alias("tc"))

    # initial threshold = the user's earliest event ts (sorted head), so
    # the state struct is typed off the data — every event passes the
    # ``>=`` check on the first advance regardless of ts column type
    state = F.struct(
        F.lit(0).cast("int").alias("c"),
        F.element_at(F.col("__evs"), 1)["t"].alias("tc"))
    for _ in range(n):
        state = F.aggregate(F.col("__evs"), state, _advance)

    one = per_user.select(state["c"].alias("__r")).agg(
        *[F.coalesce(
            F.sum(F.when(F.col("__r") >= k, 1).otherwise(0)),
            F.lit(0)).cast("bigint").alias(f"__n{k}")
          for k in range(1, n + 1)])
    return (one.select(F.explode(F.array(*[
        F.struct(F.lit(k).cast("bigint").alias("step"),
                 F.lit(steps[k - 1]).alias("step_name"),
                 F.col(f"__n{k}").alias("n_users"))
        for k in range(1, n + 1)])).alias("__x"))
        .select("__x.step", "__x.step_name", "__x.n_users"))


def retention(events: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts",
              bucket_ns: int = 86_400_000_000_000) -> DataFrame:
    """Cohort retention: ``cohort, offset, n_users`` — users grouped by
    their first-seen time bucket (day by default; ``ts`` is the
    engine-wide epoch-nanos BIGINT), counted as active at each bucket
    offset ≥ 0 from their cohort.  The n_users at offset 0 is the
    cohort size; the decay across offsets is the retention curve.

    Plan: first-seen per user (one map-side-combined aggregate on the
    user key) → join back on the SAME key (exchange reuse, no second
    layout) → distinct (user, cohort, offset) — combinable — → count
    per (cohort, offset).  Traffic after the first aggregate is
    O(users · active-buckets), never O(events).
    """
    bucket_ns = int(bucket_ns)
    if bucket_ns < 1:
        raise ValueError(f"bucket_ns must be >= 1, got {bucket_ns}")
    first = (events.groupBy(user_col)
             .agg(F.min(ts_col).alias("__first")))
    return (events.select(user_col, F.col(ts_col).alias("__ts"))
            .join(first, user_col)
            .select(user_col,
                    F.expr(f"CAST(__first DIV {bucket_ns} AS BIGINT)")
                    .alias("cohort"),
                    (F.expr(f"CAST(__ts DIV {bucket_ns} AS BIGINT)")
                     - F.expr(f"CAST(__first DIV {bucket_ns} AS BIGINT)"))
                    .alias("offset"))
            .distinct()
            .groupBy("cohort", "offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def session_paths(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  id_col: str = "event_id", gap_s: int = 1800,
                  top_k: int = 20) -> DataFrame:
    """Top user paths: the ``top_k`` most common within-session
    event-type sequences (``path, n_sessions``) — the behavioral
    path-analysis query behind every product-flow dashboard ("what do
    users actually do in a session?").

    Sessions are the same gap rule as :func:`sessionize`; within a
    session the sequence orders by (ts, ``id_col``) so equal-timestamp
    events have a deterministic, engine-portable order.  Paths join
    event types with ``>``.

    Plan: ONE hash shuffle on the user key serves the session window
    AND the per-session assembly (groupBy(user, session) preserves the
    window partitioning); the path string is built by sorting each
    session's (ts, id, type) structs in place — no second window.
    The final count + top-k runs on O(distinct paths) rows.  Path
    strings are bounded by session length; a runaway session (bot
    traffic) is the quota-cap operator's job upstream.
    """
    gap_ns = int(gap_s) * 1_000_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap_ns), 1).otherwise(0)
    tagged = (events
              .withColumn("_new", new_session)
              .withColumn("_sid", F.sum("_new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    paths = (tagged.groupBy(user_col, "_sid")
             .agg(F.concat_ws(">", F.transform(
                 F.array_sort(F.collect_list(
                     F.struct(ts_col, id_col, type_col))),
                 lambda s: s.getField(type_col))).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), "path")
            .limit(int(top_k)))


def ab_report(events: DataFrame, user_col: str = "user_id",
              value_col: str = "value", seed: int = 0,
              split: float = 0.5) -> DataFrame:
    """Deterministic A/B experiment readout: users hash-assign to
    variants A (u < ``split``) / B by the engine-wide content-hash
    uniform — the same assignment every run, engine, and partitioning,
    which is what makes an experiment AUDITABLE — then one aggregate
    yields ``variant, n, n_users, mean_value`` plus the pooled Welch
    t-statistic (same value on both rows, so the report is one
    self-contained table).

    Plan: codegen'd variant expression in the scan stage + ONE
    map-side-combined aggregate over 2 groups; the Welch algebra runs
    driver-side on the two-row result.  No shuffle beyond the 2-group
    aggregate at any scale.

    The value sums run in exact scaled BIGINT (cents and cents², the
    repo-wide TPC-H idiom): 2-decimal values make both sums integers,
    so mean/t are accumulation-order-independent — a raw DOUBLE sum
    could flip the ROUND(…, 6)/ROUND(…, 4) boundary under a different
    partitioning.  cents² sums overflow signed 64-bit only past ~10¹⁸
    (≈10⁸ rows of value≈10⁵) — switch to per-variant DECIMAL(38,0)
    aggregation beyond that.
    """
    from .sampling import _unit_hash

    if not 0.0 < split < 1.0:
        raise ValueError(f"split must be in (0, 1), got {split}")
    u = _unit_hash(user_col, seed)
    variant = F.when(u < F.lit(float(split)), "A").otherwise("B")
    c = F.expr(f"CAST(ROUND(CAST({value_col} AS DOUBLE) * 100, 0) "
               "AS BIGINT)")
    agg = (events.withColumn("variant", variant)
           .groupBy("variant")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.countDistinct(user_col).cast("bigint")
                .alias("n_users"),
                F.sum(c).alias("__s"),
                F.sum(c * c).alias("__ss"))
           .collect())
    rows = {r["variant"]: r for r in agg}
    stats = {}
    for k, r in rows.items():
        n = r["n"]
        s = r["__s"] / 100.0 if n else None
        ss = r["__ss"] / 10000.0 if n else None
        mean = s / n if n else None
        var = ((ss - s * s / n) / (n - 1)
               if n and n > 1 else None)
        stats[k] = (n, r["n_users"], mean, var)
    t = None
    if "A" in stats and "B" in stats:
        na, _, ma, va = stats["A"]
        nb, _, mb, vb = stats["B"]
        if va is not None and vb is not None:
            se = math.sqrt(va / na + vb / nb)
            t = (ma - mb) / se if se > 0 else None
    out = [(k, n, nu, round(m, 6) if m is not None else None,
            round(t, 4) if t is not None else None)
           for k, (n, nu, m, _v) in sorted(stats.items())]
    return events.sparkSession.createDataFrame(
        out, "variant string, n bigint, n_users bigint, "
             "mean_value double, t_stat double")
