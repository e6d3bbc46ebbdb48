"""Plan inspection / audit helpers."""

from knn_using_hadoop_spark.plans.explain import (
    executed_plan,
    plan_audit,
)

__all__ = ["executed_plan", "plan_audit"]
