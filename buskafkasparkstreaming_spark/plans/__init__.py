"""Plan-inspection helpers: assert the physical plan is the one you'd want
at 100 TB (pushdown reached the scan, the small side broadcast, codegen on).

Used by tests so plan regressions fail CI, not production.

Note on modes: `explain_str(df, "formatted")` is the human-readable numbered
tree; the assert helpers use the raw executedPlan string instead because it
prints operator arguments inline (`Exchange hashpartitioning(...)`) and
whole-stage-codegen membership as a `*(n)` prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
        "expected a broadcast join in plan:\n" + plan
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "unexpected cartesian product:\n" + plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "unexpected nested-loop join:\n" + plan
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Check a filter reached the parquet scan (PushedFilters: [...])."""
    plan = explain_str(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r} in plan:\n" + plan
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "*(" not in plan and "AdaptiveSparkPlan" in plan:
        # AQE finalizes (and codegen-annotates) the plan only on execution —
        # of THIS dataframe's own queryExecution (count() would plan afresh)
        df.collect()
        plan = physical_plan(df)
    assert "*(" in plan, "no WholeStageCodegen span (*(n) prefix):\n" + plan


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange hashpartitioning")
