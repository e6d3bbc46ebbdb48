"""Physical-plan inspection: the engine's scale-audit tooling.

The reference has no optimizer (SURVEY.md §4) — every optimization is
frozen in code. Here the optimizer is Catalyst, so the engineering
discipline inverts: instead of hand-building combiners, we AUDIT that
the planner produced the shapes the 100 TB design depends on. These
helpers back tests/test_plans.py and ad-hoc tuning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, max_metadata: int = 2000) -> str:
    """The (pre-execution) physical plan string, untruncated metadata."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", str(max_metadata))
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)


@dataclass
class PlanAudit:
    """Scale-relevant facts extracted from a physical plan."""

    pushed_filters: bool
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    window_group_limits: int
    partial_aggregates: bool
    python_row_udfs: bool
    arrow_python_stages: int
    exchanges: int
    notes: list[str] = field(default_factory=list)


def plan_audit(df: DataFrame) -> PlanAudit:
    plan = executed_plan(df)
    audit = PlanAudit(
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        window_group_limits=plan.count("WindowGroupLimit"),
        partial_aggregates="partial_" in plan,
        python_row_udfs="BatchEvalPython" in plan,
        arrow_python_stages=plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
        exchanges=plan.count("Exchange"),
    )
    if audit.python_row_udfs:
        audit.notes.append(
            "row-wise Python UDF in plan: move to built-ins or pandas_udf"
        )
    if audit.sort_merge_joins and audit.broadcast_joins == 0:
        audit.notes.append(
            "sort-merge join with no broadcasts: check dim-table sizes "
            "vs autoBroadcastJoinThreshold"
        )
    return audit
