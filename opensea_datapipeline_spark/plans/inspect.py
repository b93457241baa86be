"""Physical-plan introspection helpers.

Used by the plan-guardrail tests and available for ad-hoc tuning: a plan
that stops pushing filters to the scan, stops broadcasting a dimension, or
introduces a cartesian product is a scale regression even when results
stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the (possibly AQE-unfinalized) physical plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes, for assertions."""
    plan = executed_plan(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )


def has_cartesian(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def join_strategies(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    return [
        s for s in (
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct",
        )
        if s in plan
    ]
