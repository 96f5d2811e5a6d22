#!/usr/bin/env python
"""Engine-wide physical-plan lint: build every ``queries()`` plan at
sf0.001 and fail on the shapes that would not survive 100 TB —
``CartesianProduct``, ``BroadcastNestedLoopJoin`` (except the
whitelisted 1-row scalar joins), and ``BatchEvalPython`` (row-at-a-time
Python UDFs; all Python in this engine must be Arrow-batched).

Run: python tools/plan_lint.py  (~2 min: some plans train a model to
build).  Exit code 1 on any unexpected shape.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: queries whose single BroadcastNestedLoopJoin is a deliberate 1-row
#: scalar-aggregate join (corpus totals, balance stats) — a broadcast
#: of one row, not a data-sized nested loop
BNLJ_SCALAR_OK = {"text_lm_score", "text_lm_bigram", "tpch_q22",
                  # Q11's 1-row `agg` (cnt, tot) relation joined back —
                  # deliberately an aggregate-then-broadcast instead of
                  # two scalar subqueries so `val` materializes once
                  "tpch_q11",
                  # NB's vocab × class-totals cross: the broadcast side
                  # is L rows (L = #labels, contract-bounded small) —
                  # the smoothed score matrix NEEDS every (term, label)
                  # cell including count-0 ones, so the fanout is the
                  # output, not a plan accident
                  "nb_lang",
                  # per-row QE + the corpus-QE scalar: the 1-row AVG
                  # aggregate broadcast back over the scored relation
                  # (the merged som_qe_rows+som_quantization_error
                  # gate, round 10)
                  "som_qe",
                  # kmv_report (the round-12 merge survivor that
                  # retired kmv_overlap + kmv_novelty) inherits the
                  # group-pair generator: inequality join of the two
                  # G-row group lists (G = dimension cardinality,
                  # contract-bounded); sketch membership itself is a
                  # hash equi-join on the group key
                  "kmv_report"}

SF = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")


def main() -> int:
    import __spark_entry__ as entry
    from xpysom_dask_spark.session import make_session

    spark = make_session("plan-lint", master="local[8]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false",
                                     "spark.ui.showConsoleProgress":
                                         "false"})
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    all_queries = dict(entry.queries())
    # staged next-round gate queries get the same lint before promotion
    for rn in range(5, 30):
        qf = getattr(entry, f"queries_round{rn}_staged", None)
        if qf:
            for k, v in qf().items():
                all_queries.setdefault(k, v)
    for name, fn in all_queries.items():
        try:
            plan = fn(spark, SF)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:
            failures.append((name, f"plan build failed: {e!r:.120}"))
            continue
        if "CartesianProduct" in plan:
            failures.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            failures.append((name, "row-at-a-time Python UDF"))
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj and (name not in BNLJ_SCALAR_OK or n_bnlj > 1):
            failures.append((name, f"BroadcastNestedLoopJoin x{n_bnlj}"))
    spark.stop()
    if failures:
        print("PLAN LINT FAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"plan lint clean: {len(all_queries)} queries "
          f"(incl. staged), "
          f"{len(BNLJ_SCALAR_OK)} whitelisted scalar BNLJs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
