"""Physical-plan inspection helpers (the 100 TB design review as code).

These are the checks SURVEY.md §4.2 demands before an operator is "done":
filters pushed to the scan, columns pruned, small dims broadcast, the
expected number of Exchanges and no more, codegen spans over the native
stages.  tests/test_plan_shapes.py runs them against the query suite; the
same helpers are importable for ad-hoc plan review of new operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    """Executed (physical, possibly adaptive) plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters list of the first scan, '' if none."""
    plan = plan_of(df)
    if "PushedFilters: [" not in plan:
        return ""
    return plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of the first scan ('' if no file scan)."""
    plan = plan_of(df)
    if "ReadSchema: " not in plan:
        return ""
    return plan.split("ReadSchema: ", 1)[1].splitlines()[0]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan."""
    return plan_of(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_of(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_of(df)


def has_cartesian(df: DataFrame) -> bool:
    """Any all-pairs join shape (the anti-pattern every candidate-generation
    operator must avoid)."""
    plan = plan_of(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_spans(df: DataFrame) -> int:
    """How many whole-stage-codegen regions the plan compiled (the '*(n)'
    prefixes; wider spans = more work fused into generated JVM loops)."""
    import re
    return len(set(re.findall(r"\*\((\d+)\)", plan_of(df))))
