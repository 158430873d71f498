#!/usr/bin/env python
"""Full-registry physical-plan audit — the systematic version of the
spot checks in tests/test_plans.py.

For EVERY registry query, extract the physical plan and flag the
at-scale anti-patterns the round verdicts look for:

* ``global_window``   — a windowspecdefinition with NO partition columns
                        (Spark's "No Partition Defined" single-task path).
                        Benign when the window input is dimension-grain
                        or bounded (top-k frames, decile tables); fatal
                        when fact-scale rows flow through it.
* ``single_part_sort`` — an ``Exchange SinglePartition`` feeding a Sort
                        (global sorts that aren't the final TakeOrdered).
* ``cartesian``       — CartesianProduct anywhere.
* ``bnlj_non_cross``  — BroadcastNestedLoopJoin that is NOT a Cross
                        scalar attachment (Inner/Left conditions over a
                        broadcast = O(n·m) predicate evaluation).
* ``row_python_udf``  — BatchEvalPython (row-at-a-time Python UDF; the
                        one in udf_kit is deliberate surface parity).
* ``hof_filter_recompute`` — a Filter whose condition embeds a
                        lambdafunction: the InferFiltersFromGenerate
                        pathology (round 13) where a non-outer Generate
                        over a computed array drags the entire inlined
                        array computation into a pushed-down filter,
                        re-running it per row below the exchange.

Output: ONE JSON line {query: [flags...]} for flagged queries plus a
summary, and a markdown table on stderr for the round log. The audit is
advisory — `PLAN_AUDIT.md` records the adjudication of every flag
(defect vs documented exact-small trade-off vs benign bounded frame).

Usage: python plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agent_data_pipeline_spark.queries import REGISTRY
from agent_data_pipeline_spark.session import get_spark


def audit_plan(plan: str) -> list[str]:
    flags: list[str] = []
    # windowspecdefinition(args) — partition cols precede the ORDER BY
    # marker ("ASC NULLS"/"DESC NULLS"). A spec whose FIRST argument is
    # already the ordering column has no partition clause.
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        first = spec.split(",")[0]
        if (" ASC" in first or " DESC" in first) and "global_window" not in flags:
            flags.append("global_window")
    if re.search(r"Arguments: SinglePartition[\s\S]{0,400}?\(\d+\) Sort", plan):
        # formatted explain lists Exchange detail then the Sort that
        # consumes it; TakeOrderedAndProject never prints this pair
        flags.append("single_part_sort")
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    # BNLJ join-type detection, token-based (not order-sensitive): Spark
    # 4's formatted tree line prints "BroadcastNestedLoopJoin <JoinType>
    # <BuildSide> (id)" while the detail section repeats the bare node
    # name with no join-type Arguments (verified empirically — the AQE
    # initial plan's Arguments line is just isFinalPlan). Strategy: on
    # every BNLJ line, drop BuildLeft/BuildRight tokens; the first
    # remaining token is the join type. Bare detail-header lines yield
    # no token and are skipped — but if BNLJ appears in the plan and NO
    # line ever yields a join type (a future format hiding it), flag
    # conservatively rather than silently passing the regression gate.
    if "BroadcastNestedLoopJoin" in plan:
        kinds: list[str] = []
        for m in re.finditer(r"BroadcastNestedLoopJoin\b([^\n(]*)", plan):
            toks = [
                t.strip(",")
                for t in m.group(1).split()
                if t.strip(",") not in ("BuildLeft", "BuildRight")
            ]
            if toks:
                kinds.append(toks[0])
        if not kinds or any(k != "Cross" for k in kinds):
            flags.append("bnlj_non_cross")
    if "BatchEvalPython" in plan:
        flags.append("row_python_udf")
    # Filter re-evaluating a higher-order function: the round-13
    # InferFiltersFromGenerate pathology — a non-outer Generate over a
    # computed array infers `size(expr) > 0`, and filter pushdown can
    # drag the ENTIRE inlined array computation below an exchange,
    # re-running it (interpreted, possibly single-threaded) per row.
    # Measured 103 s vs 3 s on the band-key operator. Any Filter whose
    # condition embeds a lambdafunction is that class (registry-wide
    # sweep at adoption: zero benign hits).
    for block in re.split(r"\n\(\d+\) ", plan):
        if block.startswith("Filter") and "lambdafunction" in block.split(
            "Condition :"
        )[-1].split("\n")[0]:
            if "hof_filter_recompute" not in flags:
                flags.append("hof_filter_recompute")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="agent_data_pipeline_spark-plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    n = 0
    for name, spec in REGISTRY.items():
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # streaming sources can't explain pre-start
            errors[name] = type(e).__name__
            continue
        n += 1
        flags = audit_plan(plan)
        if flags:
            flagged[name] = flags
    counts: dict[str, int] = {}
    for fl in flagged.values():
        for f in fl:
            counts[f] = counts.get(f, 0) + 1
    print(
        json.dumps(
            {
                "audited": n,
                "skipped": errors,
                "flag_counts": counts,
                "flagged": flagged,
            }
        )
    )
    for name, fl in sorted(flagged.items()):
        print(f"| {name} | {', '.join(fl)} |", file=sys.stderr)


if __name__ == "__main__":
    main()
